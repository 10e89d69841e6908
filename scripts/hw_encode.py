"""HW timing of the device encoder: the E1+E2 kernel pair AND the
full fused program (E1 -> E2 -> shift -> E3, payload granules in HBM),
fenced, two-batch differenced (the relay round-trip varies 23-36 ms).

Usage: python scripts/hw_encode.py [corpus ...]
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


def main():
    corpora = sys.argv[1:] or ["kjv.txt"]
    from huffmandecoderongpus_tpu import data
    from huffmandecoderongpus_tpu.huffio.tree import tree_codes
    from huffmandecoderongpus_tpu.ops import pallas_encode as pe

    fl = floor_s()
    print(f"floor {fl*1e3:.1f} ms", flush=True)
    for c in corpora:
        td = data.load_test_data(c)
        arr = np.asarray(td.ucd, dtype=np.uint8)
        tree = td.cd.tree
        code, length, present = tree_codes(tree)
        N = int(arr.size)
        G = 1 << max((N // 512).bit_length() - 1, 0)
        G = max(128, min(G, 1 << 13))
        SEG = 16
        K_real = -(-N // G)
        K = -(-(K_real + 1) // SEG) * SEG
        R = G // 128
        lo_t, hi_t = pe.build_pack_tables(code, length)
        lanes_mat = np.zeros((G, K), dtype=np.uint8)
        tmp = np.zeros(G * K_real, dtype=np.uint8)
        tmp[:N] = arr
        lanes_mat[:, :K_real] = tmp.reshape(G, K_real)
        nval = np.clip(N - np.arange(G, dtype=np.int64) * K_real, 0,
                       K_real).astype(np.int32)
        nval_j = jnp.asarray(nval.reshape(R, 128))
        data3 = jnp.asarray(
            np.ascontiguousarray(lanes_mat.T).reshape(K, R, 128))
        lo_j = jnp.asarray(pe._chunk256(lo_t))
        hi_j = jnp.asarray(pe._chunk256(hi_t))
        rows = 2 * K
        rows_p = -(-rows // 128) * 128
        hist = np.bincount(arr, minlength=256)
        avg = float(hist @ length.astype(np.int64)) / N
        ORP = -(-min(int(K_real * avg / 16 * 1.6) + 4, rows_p) // 128) * 128

        @jax.jit
        def kernels(data3, lo_j, hi_j, nval_j=nval_j):
            gran, gval, cnt2, bits2 = pe.e1_pack(
                data3, lo_j, hi_j, nval_j, K=K, G=G, SEG=SEG)
            granT = gran.reshape(rows, G).T
            gvalT = gval.reshape(rows, G).T
            if rows_p != rows:
                granT = jnp.pad(granT, ((0, 0), (0, rows_p - rows)))
                gvalT = jnp.pad(gvalT, ((0, 0), (0, rows_p - rows)))
            denseT = pe.e2_compact(granT, gvalT, G=G, rows_p=rows_p, ORP=ORP)
            return denseT[0, 0] + cnt2[0, 0]  # scalar fence

        total_bits = int(hist @ length.astype(np.int64))
        n_granules = -(-total_bits // 16)
        ORPW = ORP // 128
        NROWS = (-(-n_granules // 128) + ORPW + 8) // 8 * 8

        def full(data3, lo_j, hi_j):
            out2, cnt2, fence = pe.encode_program(
                data3, lo_j, hi_j, nval_j, K=K, G=G, SEG=SEG, rows_p=rows_p,
                ORP=ORP, ORPW=ORPW, NROWS=NROWS)
            return fence

        def timed(fn):
            out = fn(data3, lo_j, hi_j)
            np.asarray(out).reshape(-1)[:1]

            def batch(k):
                t0 = time.perf_counter()
                for _ in range(k):
                    o = fn(data3, lo_j, hi_j)
                np.asarray(o).reshape(-1)[:1]
                return time.perf_counter() - t0

            la = min(batch(10) for _ in range(6))
            lb = min(batch(30) for _ in range(6))
            return max(lb - la, 1e-9) / 20

        t = timed(kernels)
        print(f"{c}: E1+E2 {t*1e3:.3f} ms  -> {N/t/1e9:.2f} GB/s "
              f"(G={G} K={K} ORP={ORP})", flush=True)
        tf = timed(full)
        print(f"{c}: full  {tf*1e3:.3f} ms  -> {N/tf/1e9:.2f} GB/s "
              f"(NROWS={NROWS})", flush=True)


if __name__ == "__main__":
    main()
