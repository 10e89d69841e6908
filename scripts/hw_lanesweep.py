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

    # interleaved two-batch differencing, enough trials that the min
    # round-trip draw converges (~±0.02 ms; see hw_sweep4.timeit)
    K, trials = 10, 18
    la = {g: [] for g in runs}
    lb = {g: [] for g in runs}

    def batch(run, k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = run()
        np.asarray(o[3]).reshape(-1)[:1]
        return time.perf_counter() - t0

    for trial in range(trials):
        for g, run in runs.items():
            la[g].append(batch(run, K))
            lb[g].append(batch(run, 3 * K))
    for g in sorted(runs):
        t = max(min(lb[g]) - min(la[g]), 1e-9) / (2 * K)
        gbps = hf.uncompressed_size / t / 1e9
        print(f"G={g:6d}: {t*1e3:7.3f} ms  {gbps:5.2f} GB/s", flush=True)


if __name__ == "__main__":
    main()
