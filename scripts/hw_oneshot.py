"""HW validation + timing of the one-shot fused decoder vs the 4-kernel
program on small corpora.

Usage: python scripts/hw_oneshot.py [corpus ...]
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


def timeit(fn, fence, floor, K=20, trials=5):
    out = fn()
    np.asarray(fence(out)).reshape(-1)[:1]
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn()
        np.asarray(fence(out)).reshape(-1)[:1]
        ts.append((time.perf_counter() - t0 - floor) / K)
    return min(ts), out


def main():
    corpora = sys.argv[1:] or ["paper1", "news", "book2"]
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
        ok = ons.oneshot_eligible(st)
        print(f"{corpus}: bits={hf.bits} G={p['G']} md={st['md']} "
              f"H={st['H']} oneshot_eligible={ok}", flush=True)
        if not ok:
            continue
        t0 = time.perf_counter()
        try:
            run = lambda: ons.oneshot_program(
                st["words"], st["tabw"], st["lim2"], B=p["B"], H=st["H"],
                G=p["G"], steps=p["steps"], steps_p=p["steps_p"],
                SEG=p["SEG"], md=st["md"], C0=st["C0"], C1=st["C1"],
                NS=st["NS"], ORP=p["ORP"])
            denseT, n, fence = run()
            np.asarray(fence)
            print(f"  compile+run ok ({time.perf_counter()-t0:.1f}s)",
                  flush=True)
        except Exception as e:
            print(f"  FAIL {type(e).__name__}: {str(e)[:400]}", flush=True)
            continue
        dense = np.asarray(denseT)
        counts = np.asarray(n)
        mask = np.arange(p["ORP"])[None, :] < counts[:, None]
        out = dense[mask]
        exact = out.size == td.ucd.size and np.array_equal(out, td.ucd)
        print(f"  bit-exact: {exact} (got {out.size} want {td.ucd.size})",
              flush=True)
        t, _ = timeit(run, lambda o: o[2], fl)
        gbps = hf.uncompressed_size / t / 1e9
        print(f"  oneshot: {t*1e3:.3f} ms -> {gbps:.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
