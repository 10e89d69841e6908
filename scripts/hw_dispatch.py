"""Probe the relay's per-dispatch floor: amortized time/run vs K for
programs of increasing size, interleaved and repeated to expose variance."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def timeit(fn, floor, K, trials=5):
    out = fn()
    np.asarray(out).reshape(-1)[:1]
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn()
        np.asarray(out).reshape(-1)[:1]
        ts.append((time.perf_counter() - t0 - floor) / K)
    return min(ts)


def main():
    fl = floor_s()
    print(f"floor {fl*1e3:.1f} ms", flush=True)

    x = jnp.zeros(8, jnp.int32)
    jadd = jax.jit(lambda x: x + 1)

    def triv_k(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1

    xp = jnp.zeros((8, 128), jnp.int32)

    @jax.jit
    def triv(xp):
        return pl.pallas_call(
            triv_k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(xp)

    # medium-sized pallas: 64 steps of vector work on (32,128)
    def med_k(x_ref, o_ref):
        def body(i, a):
            return a * 3 + i
        o_ref[...] = jax.lax.fori_loop(0, 64, body, x_ref[...])

    xm = jnp.zeros((32, 128), jnp.int32)

    @jax.jit
    def med(xm):
        return pl.pallas_call(
            med_k, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(xm)

    for rep in range(3):
        for K in (10, 50):
            a = timeit(lambda: jadd(x), fl, K)
            b = timeit(lambda: triv(xp), fl, K)
            c = timeit(lambda: med(xm), fl, K)
            print(f"rep{rep} K={K:3d}: jit(x+1) {a*1e6:7.1f} us  "
                  f"triv-pallas {b*1e6:7.1f} us  med-pallas {c*1e6:7.1f} us",
                  flush=True)


if __name__ == "__main__":
    main()
