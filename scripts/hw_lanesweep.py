"""Interleaved lane-count sweep of the widescan program on one corpus —
same-session A/B so relay drift cancels.

Usage: python scripts/hw_lanesweep.py [corpus] [G ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def floor_s(reps=8):
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(8, jnp.int32)
    np.asarray(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(x))[0]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "kjv.txt"
    gs = [int(g) for g in sys.argv[2:]] or [4096, 8192, 16384]
    from huffmandecoderongpus_tpu import data
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    td = data.load_test_data(corpus)
    hf = td.cd
    fl = floor_s()
    print(f"floor {fl*1e3:.1f} ms", flush=True)

    runs = {}
    for G in gs:
        st = ws.stage_widescan_inputs(hf, lanes=G)
        p = st["plan"]

        def run(st=st, p=p):
            return ws.wide_decode_program(
                st["words"], st["tabw"], st["lim2"], B=p["B"], H=st["H"],
                G=p["G"], steps=p["steps"], steps_p=p["steps_p"],
                SEG=p["SEG"], UNROLL=p["UNROLL"], md=st["md"], Rg=p["Rg"],
                NG=p["NG"], ORP=p["ORP"], RB=p["RB"], C0=st["C0"],
                C1=st["C1"], NS=st["NS"], chunk2=st["chunk2"])

        t0 = time.perf_counter()
        denseT, n, total, fence = run()
        np.asarray(fence)
        counts = np.asarray(n)
        mask = np.arange(p["ORP"])[None, :] < counts[:, None]
        out = np.asarray(denseT)[mask]
        ok = out.size == td.ucd.size and np.array_equal(out, td.ucd)
        print(f"G={p['G']:6d} compile {time.perf_counter()-t0:5.1f}s "
              f"exact={ok} ORP={p['ORP']}", flush=True)
        runs[p["G"]] = run

    K = 10
    best = {g: 1e9 for g in runs}
    for trial in range(6):
        for g, run in runs.items():
            t0 = time.perf_counter()
            for _ in range(K):
                o = run()
            np.asarray(o[3]).reshape(-1)[:1]
            best[g] = min(best[g], (time.perf_counter() - t0 - fl) / K)
    for g in sorted(best):
        gbps = hf.uncompressed_size / best[g] / 1e9
        print(f"G={g:6d}: {best[g]*1e3:7.3f} ms  {gbps:5.2f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
