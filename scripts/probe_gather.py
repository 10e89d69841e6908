"""HW probe: Mosaic axis-1 take_along_axis at lane widths > 128.

Round-1 established axis-1 dynamic_gather works at width exactly 128 and
axis-0 is limited to 8 sublanes.  The transpose-based dense-compaction
scheme needs per-row gathers along a steps axis laid out on lanes at
widths ~1.5k.  This probes (8, W) and (128, W) for W in {128, 256, 1536}.

Run in background; failed Mosaic compiles return cleanly (HTTP 500).
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kern(tab_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(tab_ref[...], idx_ref[...], axis=1)


@functools.partial(jax.jit, static_argnames=("shape",))
def probe(tab, idx, shape):
    return pl.pallas_call(
        _kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
    )(tab, idx)


def main():
    rng = np.random.default_rng(0)
    for (S, W) in [(8, 128), (8, 256), (8, 1536), (128, 1536), (256, 1536)]:
        tab = rng.integers(0, 1 << 20, (S, W)).astype(np.int32)
        idx = rng.integers(0, W, (S, W)).astype(np.int32)
        want = np.take_along_axis(tab, idx, axis=1)
        try:
            got = np.asarray(probe(jnp.asarray(tab), jnp.asarray(idx), (S, W)))
            ok = np.array_equal(got, want)
            print(f"axis1 ({S},{W}): {'EXACT' if ok else 'WRONG'}", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"axis1 ({S},{W}): FAIL {type(e).__name__}: {msg}", flush=True)

    # axis-0 at >8 sublanes, u8 operand — reconfirm round-1 limits
    for (S, W, dt) in [(16, 128, np.int32), (8, 128, np.uint8)]:
        tab = rng.integers(0, 100, (S, W)).astype(dt)
        idx = rng.integers(0, S, (S, W)).astype(np.int32)

        def _k0(tab_ref, idx_ref, out_ref):
            out_ref[...] = jnp.take_along_axis(tab_ref[...], idx_ref[...], axis=0)

        try:
            got = np.asarray(pl.pallas_call(
                _k0,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((S, W), tab.dtype),
            )(jnp.asarray(tab), jnp.asarray(idx)))
            ok = np.array_equal(got, np.take_along_axis(tab, idx, axis=0))
            print(f"axis0 ({S},{W},{np.dtype(dt).name}): "
                  f"{'EXACT' if ok else 'WRONG'}", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"axis0 ({S},{W},{np.dtype(dt).name}): FAIL "
                  f"{type(e).__name__}: {msg}", flush=True)
    print("platform:", jax.devices()[0].platform, flush=True)


if __name__ == "__main__":
    main()
