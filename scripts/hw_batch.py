"""Round-5 same-session A/B: ONE batched program vs per-stream decodes.

Usage: python scripts/hw_batch.py [corpus ...]   (default paper1 news book2)

Times the on-device unit (fence readback, interleaved two-batch
differencing — see scripts/hw_sweep4.timeit) for:
  * each corpus individually through the round-4 routed path
    (one-shot single dispatch when eligible, else the 4-kernel program);
  * all corpora through ONE batched program (ops/pallas_batch).
The batch pays the ~0.11 ms per-program dispatch floor once instead of
N times; this script produces the DESIGN.md aggregate table.
"""
import sys

import numpy as np

from _timing import floor_s, timeit


def main():
    import os

    names = sys.argv[1:] or ["paper1", "news", "book2"]
    from huffmandecoderongpus_tpu import data
    from huffmandecoderongpus_tpu.ops import pallas_batch as pb
    from huffmandecoderongpus_tpu.ops import pallas_oneshot as ons
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    fl = floor_s()
    print(f"floor {fl*1e3:.2f} ms", flush=True)
    tds = [data.load_test_data(n) for n in names]
    total_bytes = sum(td.ucd.size for td in tds)
    B_env = os.environ.get("HUFF_BATCH_B")
    B_force = int(B_env) if B_env else None
    md_env = os.environ.get("HUFF_BATCH_MD")
    md_force = int(md_env) if md_env else None
    lb_env = os.environ.get("HUFF_BATCH_LB")
    lb = int(lb_env) if lb_env else None
    batch_first = os.environ.get("HUFF_BATCH_FIRST", "1") != "0"

    def measure_batch():
        st = pb.stage_batch_inputs([td.cd for td in tds], B=B_force,
                                   md_force=md_force, lane_block=lb)
        p = st["plan"]
        print(f"batch plan: B={p['B']} G={p['G']} RB={p['RB']} "
              f"ORP={p['ORP']} H={st['H']} md={st['md']} "
              f"bounds={st['tab_bounds']}", flush=True)

        def runb():
            return pb.batch_decode_program(
                st["words"], st["tabw"], st["lim2"], st["c01"], B=p["B"],
                H=st["H"], G=p["G"], steps=p["steps"],
                steps_p=p["steps_p"], SEG=p["SEG"], UNROLL=p["UNROLL"],
                md=st["md"], Rg=p["Rg"], NG=p["NG"], ORP=p["ORP"],
                RB=p["RB"], tab_bounds=st["tab_bounds"],
                last_live=st["last_live"])

        tb, out = timeit(runb, lambda o: o[3])
        denseT, n = np.asarray(out[0]), np.asarray(out[1])
        ok = True
        for k, td in enumerate(tds):
            g0, gp = st["g0"][k], st["g_pad"][k]
            ck = n[g0:g0 + gp]
            mask = np.arange(p["ORP"])[None, :] < ck[:, None]
            ok = ok and np.array_equal(denseT[g0:g0 + gp][mask], td.ucd)
        print(f"batched {len(tds)} streams: {tb*1e3:7.3f} ms  "
              f"{total_bytes/tb/1e9:6.2f} GB/s aggregate  exact={ok}",
              flush=True)
        return tb

    tb = measure_batch() if batch_first else None

    # --- individual routed decodes (round-4 routing incl. the
    # ONESHOT_MAX_BITS threshold, exactly as decode_widescan routes) -------
    t_ind = 0.0
    for td in tds:
        hf = td.cd
        st = ws.stage_widescan_inputs(hf)
        p = st["plan"]
        if hf.bits < ws.ONESHOT_MAX_BITS and ons.oneshot_eligible(st):
            run = lambda st=st, p=p: ons.oneshot_program(
                st["words"], st["tabw"], st["lim2"], B=p["B"], H=st["H"],
                G=p["G"], steps=p["steps"], steps_p=p["steps_p"],
                SEG=p["SEG"], md=st["md"], C0=st["C0"], C1=st["C1"],
                NS=st["NS"], ORP=p["ORP"])
            t, out = timeit(run, lambda o: o[2])
            which = "oneshot"
            denseT, n = out[0], out[1]
        else:
            run = lambda st=st, p=p: ws.wide_decode_program(
                st["words"], st["tabw"], st["lim2"], B=p["B"], H=st["H"],
                G=p["G"], steps=p["steps"], steps_p=p["steps_p"],
                SEG=p["SEG"], UNROLL=p["UNROLL"], md=st["md"], Rg=p["Rg"],
                NG=p["NG"], ORP=p["ORP"], RB=p["RB"], C0=st["C0"],
                C1=st["C1"], NS=st["NS"], chunk2=st["chunk2"])
            t, out = timeit(run, lambda o: o[3])
            which = "wide"
            denseT, n = out[0], out[1]
        counts = np.asarray(n)
        mask = np.arange(p["ORP"])[None, :] < counts[:, None]
        ok = np.array_equal(np.asarray(denseT)[mask], td.ucd)
        print(f"{td.name:10s} {which:8s} {t*1e3:7.3f} ms "
              f"{td.ucd.size/t/1e9:6.2f} GB/s exact={ok}", flush=True)
        t_ind += t

    if tb is None:  # HUFF_BATCH_FIRST=0: batch measured after individuals
        tb = measure_batch()
    print(f"sum of individual: {t_ind*1e3:7.3f} ms "
          f"({total_bytes/t_ind/1e9:6.2f} GB/s) -> batch saves "
          f"{(t_ind-tb)*1e3:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
