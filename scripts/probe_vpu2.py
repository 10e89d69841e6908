"""HW probe 3: proper VPU calibration (floor-subtracted, ILP variants).

Measures, on (128,128) i32 tiles inside one Pallas kernel:
  - arith throughput: P independent chains x S steps of add/xor
  - arith latency:    1 chain (serial)
  - gather throughput: P independent gather chains
  - gather latency:    1 serial gather chain
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 128, 128
VREGS = R * C // 1024


def _floor():
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(8, jnp.int32)
    np.asarray(f(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(f(x))[0]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _time(run, x, floor, K=8):
    out = run(x)
    np.asarray(out).reshape(-1)[:1]
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(K):
            out = run(x)
        np.asarray(out).reshape(-1)[:1]
        ts.append((time.perf_counter() - t0 - floor) / K)
    return min(ts)


def make_arith(P, S):
    def kern(x_ref, o_ref):
        chains = [x_ref[...] + i for i in range(P)]

        def body(i, cs):
            return tuple(c + (c ^ 3) for c in cs)

        cs = jax.lax.fori_loop(0, S, body, tuple(chains))
        acc = cs[0]
        for c in cs[1:]:
            acc = acc + c
        o_ref[...] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        )(x)
    return run, 2 * P * S  # vector ops per kernel (each VREGS vregs)


def make_gather(P, S):
    def kern(x_ref, o_ref):
        tab = x_ref[...]
        chains = [(x_ref[...] + i) & (C - 1) for i in range(P)]

        def body(i, cs):
            return tuple(jnp.take_along_axis(tab, c & (C - 1), axis=1)
                         for c in cs)

        cs = jax.lax.fori_loop(0, S, body, tuple(chains))
        acc = cs[0]
        for c in cs[1:]:
            acc = acc + c
        o_ref[...] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        )(x)
    return run, P * S  # gathers per kernel


def main():
    floor = _floor()
    print(f"floor {floor*1e3:.1f} ms", flush=True)
    x = (jnp.arange(R * C, dtype=jnp.int32).reshape(R, C)) % C

    for name, maker, cases in [
        ("arith", make_arith, [(1, 4000), (4, 4000), (8, 4000)]),
        ("gather", make_gather, [(1, 4000), (4, 4000), (8, 4000)]),
    ]:
        for P, S in cases:
            run, nops = maker(P, S)
            t = _time(run, x, floor)
            ns_op = t / nops * 1e9
            ns_vreg = ns_op / VREGS
            print(f"{name} P={P}: {t*1e3:.3f} ms  {ns_op:7.2f} ns/op "
                  f"({ns_op*0.94:6.1f} cyc)  {ns_vreg:6.2f} ns/vreg "
                  f"({ns_vreg*0.94:5.2f} cyc)", flush=True)
    print("platform:", jax.devices()[0].platform, flush=True)


if __name__ == "__main__":
    main()
