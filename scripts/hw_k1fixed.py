"""Probe: where does the small-corpus K1 fixed cost come from?

Times (amortized, fenced):
  1. a trivial Pallas kernel (one (8,128) copy)          -> pure launch cost
  2. a trivial Pallas kernel with a (RG,S) grid + scratch -> grid/scratch cost
  3. K1 on paper1 with discovery on vs off               -> candidate share
  4. K1 main-scan-only with varying UNROLL duplication    -> code-size share
"""
import functools
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


def timeit(fn, floor, K=20, trials=5):
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

    # 1. trivial kernel
    def triv_k(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1

    x = jnp.zeros((8, 128), jnp.int32)

    @jax.jit
    def triv(x):
        return pl.pallas_call(
            triv_k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

    t = timeit(lambda: triv(x), fl)
    print(f"trivial pallas kernel: {t*1e6:.1f} us", flush=True)

    # 1b. five trivial kernels chained in one jit
    @jax.jit
    def triv5(x):
        for _ in range(5):
            x = pl.pallas_call(
                triv_k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
        return x

    t = timeit(lambda: triv5(x), fl)
    print(f"5 chained trivial kernels: {t*1e6:.1f} us", flush=True)

    # 2. gridded kernel with scratch, shaped like paper1's K1 (grid (1,4))
    def grid_k(x_ref, o_ref, s1, s2, s3, s4):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            s1[...] = jnp.zeros((32, 128), jnp.int32)
            s2[...] = jnp.zeros((14, 32, 128), jnp.int32)
            s3[...] = jnp.zeros((12, 32, 128), jnp.int32)
            s4[...] = jnp.zeros((12, 32, 128), jnp.int32)

        o_ref[...] = x_ref[...] + s1[0, 0]

    xg = jnp.zeros((4, 32, 128), jnp.int32)

    @jax.jit
    def grid(xg):
        return pl.pallas_call(
            functools.partial(grid_k),
            grid=(1, 4),
            in_specs=[pl.BlockSpec((1, 32, 128), lambda rg, s: (s, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 32, 128), lambda rg, s: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, 32, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((32, 128), jnp.int32),
                            pltpu.VMEM((14, 32, 128), jnp.int32),
                            pltpu.VMEM((12, 32, 128), jnp.int32),
                            pltpu.VMEM((12, 32, 128), jnp.int32)],
        )(xg)

    t = timeit(lambda: grid(xg), fl)
    print(f"gridded kernel w/ scratch: {t*1e6:.1f} us", flush=True)

    # 3. paper1 K1 with and without discovery
    from huffmandecoderongpus_tpu import data
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    td = data.load_test_data("paper1")
    hf = td.cd
    st = ws.stage_widescan_inputs(hf)
    p = st["plan"]
    kw = dict(B=p["B"], H=st["H"], G=p["G"], steps=p["steps"],
              steps_p=p["steps_p"], SEG=p["SEG"], UNROLL=p["UNROLL"],
              md=st["md"], RB=p["RB"], C0=st["C0"], C1=st["C1"],
              NS=st["NS"])
    b3, tw, l2 = st["words"], st["tabw"], st["lim2"]

    @jax.jit
    def k1_disc(b3, tw, l2):
        wmat = ws.words_matrix_device(b3, -(-p["steps_p"] // 32))
        sym, *_ = ws.k1_scan2(wmat, tw, l2, discover=True, **kw)
        return sym[0, 0, 0]

    @jax.jit
    def k1_nodisc(b3, tw, l2):
        wmat = ws.words_matrix_device(b3, -(-p["steps_p"] // 32))
        sym, *_ = ws.k1_scan2(wmat, tw, l2, discover=False, **kw)
        return sym[0, 0, 0]

    t = timeit(lambda: k1_disc(b3, tw, l2), fl)
    print(f"paper1 K1 discover=True : {t*1e6:.1f} us", flush=True)
    t = timeit(lambda: k1_nodisc(b3, tw, l2), fl)
    print(f"paper1 K1 discover=False: {t*1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()
