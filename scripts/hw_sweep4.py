"""Round-4 same-session sweep: 4-kernel program + one-shot on every corpus.

Usage: python scripts/hw_sweep4.py [corpus ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def floor_s(reps=10):
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(8, jnp.int32)
    np.asarray(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(x))[0]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timeit(fn, fence, floor, K=10, trials=25):
    """Two-batch differencing: per-run time = (T(3K) - T(K)) / 2K, so the
    relay's per-fence round-trip (which varies 23-36 ms between batches)
    cancels instead of being subtracted as a separately-measured floor.
    K and 3K batches INTERLEAVE (session drift hits both sides equally)
    and trials is high enough that min() of each side's round-trip draw
    converges — at 7 trials the residual was ±0.15 ms, swamping sub-0.3 ms
    programs; 25 interleaved trials measured repeatable to ~±0.02 ms."""
    del floor
    out = fn()
    np.asarray(fence(out)).reshape(-1)[:1]

    def batch(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn()
        np.asarray(fence(o)).reshape(-1)[:1]
        return time.perf_counter() - t0

    las, lbs = [], []
    for _ in range(trials):
        las.append(batch(K))
        lbs.append(batch(3 * K))
    return max(min(lbs) - min(las), 1e-9) / (2 * K), out


def main():
    corpora = sys.argv[1:] or ["paper1", "news", "book2", "world192.txt",
                               "bible.txt", "E.coli", "kjv.txt"]
    from huffmandecoderongpus_tpu import data
    from huffmandecoderongpus_tpu.ops import pallas_oneshot as ons
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    fl = floor_s()
    print(f"floor {fl*1e3:.1f} ms", flush=True)
    for corpus in corpora:
        td = data.load_test_data(corpus)
        hf = td.cd
        st = ws.stage_widescan_inputs(hf)
        p = st["plan"]
        size = hf.uncompressed_size

        def check(denseT, counts):
            dense = np.asarray(denseT)
            counts = np.asarray(counts)
            mask = np.arange(p["ORP"])[None, :] < counts[:, None]
            out = dense[mask]
            return out.size == td.ucd.size and np.array_equal(out, td.ucd)

        # 4-kernel program
        runw = lambda: ws.wide_decode_program(
            st["words"], st["tabw"], st["lim2"], B=p["B"], H=st["H"],
            G=p["G"], steps=p["steps"], steps_p=p["steps_p"], SEG=p["SEG"],
            UNROLL=p["UNROLL"], md=st["md"], Rg=p["Rg"], NG=p["NG"],
            ORP=p["ORP"], RB=p["RB"], C0=st["C0"], C1=st["C1"],
            NS=st["NS"], chunk2=st["chunk2"])
        denseT, n, total, fence = runw()
        np.asarray(fence)
        okw = check(denseT, n)
        tw, _ = timeit(runw, lambda o: o[3], fl)
        line = (f"{corpus:14s} wide {tw*1e3:7.3f} ms {size/tw/1e9:6.2f} GB/s"
                f" exact={okw}")
        if ons.oneshot_eligible(st):
            runo = lambda: ons.oneshot_program(
                st["words"], st["tabw"], st["lim2"], B=p["B"], H=st["H"],
                G=p["G"], steps=p["steps"], steps_p=p["steps_p"],
                SEG=p["SEG"], md=st["md"], C0=st["C0"], C1=st["C1"],
                NS=st["NS"], ORP=p["ORP"])
            denseT, n, fence = runo()
            np.asarray(fence)
            oko = check(denseT, n)
            to, _ = timeit(runo, lambda o: o[2], fl)
            line += (f" | oneshot {to*1e3:7.3f} ms {size/to/1e9:6.2f} GB/s"
                     f" exact={oko}")
        print(line, flush=True)


if __name__ == "__main__":
    main()
