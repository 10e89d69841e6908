"""Locate K4's cost: time stripped variants (transpose-only; +prefix;
full) on real hardware with staged K3 outputs.

Usage: python scripts/hw_k4probe.py [corpus] [lanes]
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


def _k4_stripped(sym_ref, val_ref, out_ref, *, cells_p, cells_pp, ORP, RT,
                 stage):
    CW = cells_pp // 128
    iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    for r in range(RT):
        symT = sym_ref[:, r, :].T
        nibT = val_ref[:, r, :].T
        if cells_pp != cells_p:
            pad = cells_pp - cells_p
            symT = jnp.concatenate(
                [symT, jnp.zeros((128, pad), jnp.int32)], axis=1)
            nibT = jnp.concatenate(
                [nibT, jnp.zeros((128, pad), jnp.uint8)], axis=1)
        if stage == "transpose":
            acc = jnp.zeros((128, 128), jnp.int32)
            for w in range(CW):
                sl = slice(w * 128, (w + 1) * 128)
                acc = acc ^ symT[:, sl] ^ nibT[:, sl].astype(jnp.int32)
            out_ref[r * 128:(r + 1) * 128, 0:128] = acc.astype(jnp.uint8)
            continue
        wpre = [jnp.zeros((128, 1), jnp.int32)]
        acc = jnp.zeros((128, 128), jnp.int32)
        for w in range(CW):
            sl = slice(w * 128, (w + 1) * 128)
            nib = nibT[:, sl].astype(jnp.int32)
            c2 = ((nib & 1) + ((nib >> 1) & 1)
                  + ((nib >> 2) & 1) + ((nib >> 3) & 1))
            cum = c2
            sh = 1
            while sh < 128:
                cum = cum + jnp.where(iota >= sh,
                                      pltpu.roll(cum, sh, axis=1), 0)
                sh <<= 1
            acc = acc ^ cum ^ symT[:, sl]
            wpre.append(wpre[-1] + cum[:, 127:128])
        out_ref[r * 128:(r + 1) * 128, 0:128] = (
            acc + wpre[CW]).astype(jnp.uint8)


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
    R = G // 128
    cells_p = p["steps_p"] // md // ws.CELL
    cells_pp = -(-cells_p // 128) * 128
    fl = floor_s()
    print(f"{corpus} G={G} cells_p={cells_p} CW={cells_pp//128} "
          f"ORP={p['ORP']} floor {fl*1e3:.1f} ms", flush=True)

    # stage K3 outputs once (zeros are fine for timing: the kernel's
    # work is data-independent apart from the max_cnt oc gating, which
    # we neutralize by filling nibbles so counts look realistic)
    rng = np.random.default_rng(0)
    nib = (rng.random((cells_p, R, 128)) < 0.45)
    nibs = np.zeros((cells_p, R, 128), np.uint8)
    for b in range(4):
        nibs |= ((rng.random((cells_p, R, 128)) < 0.45) << b).astype(np.uint8)
    symv = jnp.asarray(rng.integers(0, 2**31, (cells_p, R, 128),
                                    dtype=np.int64).astype(np.int32))
    nibv = jnp.asarray(nibs)

    RT = 8 if R % 8 == 0 else R
    cell_spec = pl.BlockSpec((cells_p, RT, 128), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM)

    for stage in ("transpose", "prefix"):
        kern = functools.partial(_k4_stripped, cells_p=cells_p,
                                 cells_pp=cells_pp, ORP=p["ORP"], RT=RT,
                                 stage=stage)
        f = jax.jit(lambda s_, v_, kern=kern: pl.pallas_call(
            kern,
            grid=(R // RT,),
            in_specs=[cell_spec, cell_spec],
            out_specs=pl.BlockSpec((RT * 128, p["ORP"]), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, p["ORP"]), jnp.uint8),
        )(s_, v_))
        t = timeit(lambda: f(symv, nibv), lambda o: o[0, :1], fl)
        print(f"K4[{stage:9s}]: {t*1e3:.3f} ms", flush=True)

    t = timeit(lambda: ws.k4_compact(symv, nibv, G=G, cells_p=cells_p,
                                     ORP=p["ORP"]),
               lambda o: o[0, :1], fl)
    print(f"K4[full     ]: {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
