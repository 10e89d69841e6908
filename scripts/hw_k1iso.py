"""Isolate the batched K1's cost: main scan vs candidate machinery.

Same-session: (a) batch K1 discover=False (main scan only), (b) batch K1
full, (c) solo news K1 full at its natural plan, (d) solo book2 K1 full.
Usage: python scripts/hw_k1iso.py
"""
import os
import sys
import jax
import numpy as np

from _timing import timeit as _timeit


def timeit(fn, fence, K=10, trials=14):
    return _timeit(fn, fence, K=K, trials=trials)[0]


def main():
    names = sys.argv[1:] or ["paper1", "news", "book2"]
    from huffmandecoderongpus_tpu import data
    from huffmandecoderongpus_tpu.ops import pallas_batch as pb
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    tds = [data.load_test_data(n) for n in names]
    B_env = os.environ.get("HUFF_BATCH_B")
    st = pb.stage_batch_inputs([td.cd for td in tds],
                               B=int(B_env) if B_env else None)
    p = st["plan"]
    print(f"batch plan: {p} H={st['H']} md={st['md']}", flush=True)
    kw = dict(B=p["B"], H=st["H"], G=p["G"], steps=p["steps"],
              steps_p=p["steps_p"], SEG=p["SEG"], UNROLL=p["UNROLL"],
              md=st["md"], C0=0, C1=0, NS=1, RB=p["RB"],
              tab_bounds=st["tab_bounds"])

    def mk(discover):
        @jax.jit
        def f(w2, tabw, lim2, c01):
            m = ws.words_matrix_device(w2, -(-p["steps_p"] // 32))
            sym, val, cntmap, *_ = ws.k1_scan2(
                m, tabw, lim2, c01, discover=discover, **kw)
            return cntmap[0, 0, 0] + sym[0, 0, 0]
        return f

    w2, tw, l2, c01 = st["words"], st["tabw"], st["lim2"], st["c01"]
    f_nd = mk(False)
    t_nd = timeit(lambda: f_nd(w2, tw, l2, c01), lambda o: o)
    print(f"batch K1 main-only (discover=False): {t_nd*1e3:7.3f} ms",
          flush=True)
    f_d = mk(True)
    t_d = timeit(lambda: f_d(w2, tw, l2, c01), lambda o: o)
    print(f"batch K1 full: {t_d*1e3:7.3f} ms (candidates ~ "
          f"{(t_d-t_nd)*1e3:.3f})", flush=True)

    for nm in ("news", "book2"):
        td = next(t for t in tds if t.name == nm)
        sst = ws.stage_widescan_inputs(td.cd)
        sp = sst["plan"]

        @jax.jit
        def fs(w2s, tws, l2s, sst=sst, sp=sp):
            m = ws.words_matrix_device(w2s, -(-sp["steps_p"] // 32))
            sym, val, cntmap, *_ = ws.k1_scan2(
                m, tws, l2s, B=sp["B"], H=sst["H"], G=sp["G"],
                steps=sp["steps"], steps_p=sp["steps_p"], SEG=sp["SEG"],
                UNROLL=sp["UNROLL"], md=sst["md"], C0=sst["C0"],
                C1=sst["C1"], NS=sst["NS"], RB=sp["RB"])
            return cntmap[0, 0, 0] + sym[0, 0, 0]

        ts = timeit(lambda: fs(sst["words"], sst["tabw"], sst["lim2"]),
                    lambda o: o)
        print(f"solo {nm} K1 full (G={sp['G']} B={sp['B']} RB={sp['RB']} "
              f"md={sst['md']}): {ts*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
