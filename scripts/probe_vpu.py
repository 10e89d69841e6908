"""HW probe 2: i16 gather, wide roll, and VPU throughput calibration.

Calibrates cycles/vreg-op for the wide-scan kernel design: a fori_loop of
independent (128,128) i32 ops measures issue throughput; a gather variant
measures dynamic_gather cost; i16 variants test halved-width vectors.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 128, 128
STEPS = 2000


def _time(fn, *args):
    out = fn(*args)
    np.asarray(out).reshape(-1)[:1]
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn(*args)
        np.asarray(out).reshape(-1)[:1]
        ts.append((time.perf_counter() - t0) / 4)
    return min(ts)


def probe_arith(dtype, nops=8):
    """fori loop: per step, `nops` dependent-ish cheap vector ops on (R,C)."""
    def kern(x_ref, o_ref):
        def body(i, acc):
            a, b = acc
            for _ in range(nops // 2):
                a = a + b
                b = b ^ a
            return a, b
        a, b = jax.lax.fori_loop(0, STEPS, body,
                                 (x_ref[...], x_ref[...] + 1))
        o_ref[...] = a + b

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, C), dtype),
        )(x)

    x = jnp.ones((R, C), dtype)
    t = _time(run, x)
    vregs = R * C * np.dtype(dtype).itemsize // 4096  # 8x128x4B per vreg
    total_vops = STEPS * nops * vregs
    ns_per_vop = t / total_vops * 1e9
    print(f"arith {np.dtype(dtype).name} ({R},{C}) x{nops}/step: "
          f"{t*1e3:.3f} ms, {ns_per_vop:.3f} ns/vreg-op "
          f"(~{ns_per_vop*0.94:.2f} cyc @940MHz)", flush=True)


def probe_gather(dtype):
    """fori loop of chained gathers: tab (8,128) broadcast, idx (R,C)."""
    def kern(tab_ref, idx_ref, o_ref):
        tab = jnp.broadcast_to(tab_ref[0:1, :], (R, C)).astype(jnp.int32)

        def body(i, idx):
            g = jnp.take_along_axis(tab, idx & (C - 1), axis=1)
            return g

        o_ref[...] = jax.lax.fori_loop(0, STEPS, body, idx_ref[...])

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        )(tab, idx)

    tab = jnp.arange(8 * C, dtype=jnp.int32).reshape(8, C) % C
    idx = jnp.ones((R, C), jnp.int32)
    t = _time(run, tab, idx)
    vregs = R * C // 2048  # int32 (8,128)
    ns = t / (STEPS * vregs) * 1e9
    print(f"gather chain i32 ({R},{C}): {t*1e3:.3f} ms, "
          f"{ns:.3f} ns/gathered-vreg (~{ns*0.94:.2f} cyc)", flush=True)


def probe_i16_gather():
    def kern(tab_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(tab_ref[...], idx_ref[...], axis=1)

    for dt in (jnp.int16, jnp.uint16):
        try:
            tab = jnp.arange(16 * 128, dtype=dt).reshape(16, 128)
            idx = (jnp.ones((16, 128), dt) * 3).astype(
                jnp.int16 if dt == jnp.int16 else jnp.uint16)
            out = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((16, 128), dt),
            )(tab, idx)
            got = np.asarray(out)
            ok = np.array_equal(got, np.asarray(tab)[np.arange(16)[:, None],
                                                     np.full((16, 128), 3)])
            print(f"i16 gather {np.dtype(dt).name}: "
                  f"{'EXACT' if ok else 'WRONG'}", flush=True)
        except Exception as e:
            print(f"i16 gather {np.dtype(dt).name}: FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


def probe_roll():
    for shape, shift, ax in [((8, 640), 3, 1), ((128, 640), 100, 1),
                             ((64, 128), 5, 0)]:
        def kern(x_ref, o_ref):
            o_ref[...] = pltpu.roll(x_ref[...], shift, axis=ax)

        try:
            x = jnp.arange(shape[0] * shape[1], dtype=jnp.int32).reshape(shape)
            out = np.asarray(pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            )(x))
            ok = np.array_equal(out, np.roll(np.asarray(x), shift, axis=ax))
            print(f"roll {shape} s={shift} ax={ax}: "
                  f"{'EXACT' if ok else 'WRONG'}", flush=True)
        except Exception as e:
            print(f"roll {shape} s={shift} ax={ax}: FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    probe_i16_gather()
    probe_roll()
    probe_arith(jnp.int32, nops=8)
    probe_arith(jnp.int16, nops=8)
    probe_gather(jnp.int32)
    print("platform:", jax.devices()[0].platform, flush=True)
