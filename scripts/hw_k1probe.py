"""Isolate K1's candidate-discovery cost: time k1_scan2 with the real
chain count vs CH=1 (H=2), and K4 sub-stages, on real hardware.

Usage: python scripts/hw_k1probe.py [corpus] [lanes]
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


def timeit(fn, fence, floor, K=10, trials=5):
    out = fn()
    np.asarray(fence(out)).reshape(-1)[:1]
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn()
        np.asarray(fence(out)).reshape(-1)[:1]
        ts.append((time.perf_counter() - t0 - floor) / K)
    return min(ts)


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "kjv.txt"
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    from huffmandecoderongpus_tpu import data
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    td = data.load_test_data(corpus)
    hf = td.cd
    st = ws.stage_widescan_inputs(hf, lanes=(lanes or None))
    p = st["plan"]
    H, md = st["H"], st["md"]
    G = p["G"]
    fl = floor_s()
    print(f"{corpus} G={G}: H={H} md={md} floor {fl*1e3:.1f} ms", flush=True)

    kw = dict(B=p["B"], G=G, steps=p["steps"], steps_p=p["steps_p"],
              SEG=p["SEG"], UNROLL=p["UNROLL"], md=md, RB=p["RB"],
              C0=st["C0"], C1=st["C1"], NS=st["NS"])
    b3 = ws.words_matrix_device(st["words"], -(-p["steps_p"] // 32))
    tw, l2 = st["tabw"], st["lim2"]

    R = G // 128
    lim0 = jnp.zeros((R, 128), jnp.int32)       # kills all candidate work
    liminf = jnp.full((R, 128), 1 << 30, jnp.int32)  # never gates off

    cases = [
        (H, l2, f"H={H} real lim"),
        (H, lim0, f"H={H} lim=0 (no cands)"),
        (H, liminf, f"H={H} lim=inf (all live)"),
        (2, l2, "H=2 real lim"),
    ]
    for hh, lim, tag in cases:
        @jax.jit
        def run(b3, tw, lim, hh=hh):
            o = ws.k1_scan2(b3, tw, lim, H=hh, **kw)
            # scalar fence: depends on the kernel, transfers 4 bytes
            return o[2][0, 0, 0] + o[0][0, 0, 0]

        t = timeit(lambda: run(b3, tw, lim), lambda o: o, fl)
        print(f"K1 {tag:24s}: {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
