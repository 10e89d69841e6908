"""Stage-level timing of the widescan program on real hardware.

Usage: python scripts/hw_stageprof.py [corpus] [lanes]

Times nested prefixes of the fused program (K1; K1+K2; K1..K3; full) —
deltas give per-stage cost without needing to stage intermediates — plus
K4 alone fed by K1..K3 outputs held on device.
"""
import functools
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


def timeit(fn, fence, floor, K=10, trials=14):
    """Two-batch differencing (K vs 3K dispatches per fence): the relay's
    per-fence round-trip varies 23-36 ms between batches, so differencing
    cancels it instead of subtracting a separately measured floor."""
    del floor
    out = fn()
    np.asarray(fence(out)).reshape(-1)[:1]  # warm/compile

    def batch(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn()
        np.asarray(fence(o)).reshape(-1)[:1]
        return time.perf_counter() - t0

    lo = min(batch(K) for _ in range(trials))
    hi = min(batch(3 * K) for _ in range(trials))
    return max(hi - lo, 1e-9) / (2 * K)


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
    print(f"{corpus}: bits={hf.bits} H={H} md={md} chunk2={st['chunk2']} "
          f"plan={p}", flush=True)
    fl = floor_s()
    print(f"floor {fl*1e3:.1f} ms", flush=True)

    kw = dict(B=p["B"], H=H, G=G, steps=p["steps"], steps_p=p["steps_p"],
              SEG=p["SEG"], UNROLL=p["UNROLL"], md=md, RB=p["RB"])
    cells_p = p["steps_p"] // md // ws.CELL

    if st["chunk2"]:
        k1 = functools.partial(ws.k1_scan2, C0=st["C0"], C1=st["C1"], NS=st["NS"])
        k3 = functools.partial(ws.k3_fix2, C0=st["C0"], C1=st["C1"], NS=st["NS"])
    else:
        k1 = ws.k1_scan
        k3 = ws.k3_fix

    @jax.jit
    def upto_k1(bits3, tabw, lim2):
        bits3 = ws.words_matrix_device(bits3, -(-p["steps_p"] // 32))
        sym, val, cntmap, exmap, mrowmap = k1(bits3, tabw, lim2, **kw)
        return cntmap[0, 0, 0] + sym[0, 0, 0].astype(jnp.int32)

    @jax.jit
    def upto_k2(bits3, tabw, lim2):
        bits3 = ws.words_matrix_device(bits3, -(-p["steps_p"] // 32))
        sym, val, cntmap, exmap, mrowmap = k1(bits3, tabw, lim2, **kw)
        HP = cntmap.shape[0]

        def to_k2(m):
            m2 = (m.reshape(HP, G).T.reshape(p["NG"], p["Rg"], HP)
                  .transpose(1, 0, 2))
            return jnp.pad(m2, ((0, 0), (0, 0), (0, 128 - HP)))

        ent3, _ = ws.k2_compose(to_k2(exmap), jnp.zeros((1, 1), jnp.int32),
                                Rg=p["Rg"], NG=p["NG"])
        return ent3[0, 0, 0] + sym[0, 0, 0].astype(jnp.int32)

    def k3_outputs(bits3, tabw, lim2):
        bits3 = ws.words_matrix_device(bits3, -(-p["steps_p"] // 32))
        sym, val, cntmap, exmap, mrowmap = k1(bits3, tabw, lim2, **kw)
        HP = cntmap.shape[0]

        def to_k2(m):
            m2 = (m.reshape(HP, G).T.reshape(p["NG"], p["Rg"], HP)
                  .transpose(1, 0, 2))
            return jnp.pad(m2, ((0, 0), (0, 0), (0, 128 - HP)))

        ent3, _ = ws.k2_compose(to_k2(exmap), jnp.zeros((1, 1), jnp.int32),
                                Rg=p["Rg"], NG=p["NG"])
        entry = ent3[:, :, 0].T.reshape(G).astype(jnp.int32)
        cnt2 = cntmap.reshape(HP, G)
        n = ws._select_h(cnt2, entry, H)
        mrow_sel = ws._select_h(mrowmap.reshape(HP, G), entry, H)
        cut = jnp.where(entry == 0, 0, mrow_sel + 1)
        cut = jnp.where(lim2.reshape(G) > 0, cut, 0)
        cut_slot = jnp.where(cut > 0, (cut - 1) // md + 1, 0)
        msym, mval = k3(bits3, tabw, entry.reshape(R, 128),
                        cut.reshape(R, 128), cut_slot.reshape(R, 128),
                        sym, val, G=G, steps_p=p["steps_p"], SEG=p["SEG"],
                        UNROLL=p["UNROLL"], md=md, RB=p["RB"])
        return msym, mval, n

    @jax.jit
    def upto_k3(bits3, tabw, lim2):
        msym, mval, n = k3_outputs(bits3, tabw, lim2)
        return n[0] + msym[0, 0, 0].astype(jnp.int32) \
            + mval[0, 0, 0].astype(jnp.int32)

    def full(bits3, tabw, lim2):
        return ws.wide_decode_program(
            bits3, tabw, lim2, Rg=p["Rg"], NG=p["NG"], ORP=p["ORP"],
            C0=st["C0"], C1=st["C1"], NS=st["NS"], chunk2=st["chunk2"], **kw)

    @jax.jit
    def staging_only(bits3):
        m = ws.words_matrix_device(bits3, -(-p["steps_p"] // 32))
        return m[0, 0, 0]

    b3, tw, l2 = st["words"], st["tabw"], st["lim2"]
    t0s = timeit(lambda: staging_only(b3), lambda o: o, fl)
    print(f"staging only: {t0s*1e3:.3f} ms  (words_matrix_device transpose)",
          flush=True)
    t1 = timeit(lambda: upto_k1(b3, tw, l2), lambda o: o, fl)
    print(f"K1          : {t1*1e3:.3f} ms", flush=True)
    t2 = timeit(lambda: upto_k2(b3, tw, l2), lambda o: o, fl)
    print(f"K1+K2       : {t2*1e3:.3f} ms  (K2 ~ {max(t2-t1,0)*1e3:.3f})",
          flush=True)
    t3 = timeit(lambda: upto_k3(b3, tw, l2), lambda o: o, fl)
    print(f"K1..K3      : {t3*1e3:.3f} ms  (K3 ~ {max(t3-t2,0)*1e3:.3f})",
          flush=True)
    t4 = timeit(lambda: full(b3, tw, l2), lambda o: o[3], fl)
    print(f"full program: {t4*1e3:.3f} ms  (K4 ~ {max(t4-t3,0)*1e3:.3f})",
          flush=True)

    # K4 standalone on staged K3 outputs
    msym, mval, _n = jax.jit(k3_outputs)(b3, tw, l2)
    msym.block_until_ready()
    tk4 = timeit(
        lambda: ws.k4_compact(msym, mval, G=G, cells_p=cells_p,
                              ORP=p["ORP"]),
        lambda o: o[0, :1], fl)
    print(f"K4 alone    : {tk4*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
