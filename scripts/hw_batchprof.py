"""Stage attribution for the BATCHED program (cf. hw_stageprof.py).

Usage: python scripts/hw_batchprof.py [corpus ...]
Env: HUFF_BATCH_B forces the common lane bit length.
"""
import os
import sys
import jax
import jax.numpy as jnp
import numpy as np

from _timing import timeit as _timeit


def timeit(fn, fence, K=10, trials=14):
    return _timeit(fn, fence, K=K, trials=trials)[0]


def main():
    names = sys.argv[1:] or ["paper1", "news", "book2"]
    from huffmandecoderongpus_tpu import data
    from huffmandecoderongpus_tpu.ops import pallas_batch as pb
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    tds = [data.load_test_data(n) for n in names]
    B_env = os.environ.get("HUFF_BATCH_B")
    md_env = os.environ.get("HUFF_BATCH_MD")
    lb_env = os.environ.get("HUFF_BATCH_LB")
    st = pb.stage_batch_inputs([td.cd for td in tds],
                               B=int(B_env) if B_env else None,
                               md_force=int(md_env) if md_env else None,
                               lane_block=int(lb_env) if lb_env else None)

    # amortized per-PROGRAM dispatch floor via the same differencing
    _triv = jax.jit(lambda x: x + 1)
    _x8 = jnp.zeros(8, jnp.int32)
    np.asarray(_triv(_x8))
    fd = timeit(lambda: _triv(_x8), lambda o: o[:1])
    print(f"dispatch floor (differenced trivial program): {fd*1e3:.3f} ms",
          flush=True)
    p = st["plan"]
    H, md = st["H"], st["md"]
    G = p["G"]
    R = G // 128
    cells_p = p["steps_p"] // md // ws.CELL
    print(f"plan: {p} H={H} md={md} bounds={st['tab_bounds']}", flush=True)
    kw = dict(B=p["B"], H=H, G=G, steps=p["steps"], steps_p=p["steps_p"],
              SEG=p["SEG"], UNROLL=p["UNROLL"], md=md, C0=0, C1=0, NS=1,
              RB=p["RB"], tab_bounds=st["tab_bounds"])

    @jax.jit
    def staging_only(w2):
        m = ws.words_matrix_device(w2, -(-p["steps_p"] // 32))
        return m[0, 0, 0]

    @jax.jit
    def upto_k1(w2, tabw, lim2, c01):
        m = ws.words_matrix_device(w2, -(-p["steps_p"] // 32))
        sym, val, cntmap, *_ = ws.k1_scan2(m, tabw, lim2, c01, **kw)
        return cntmap[0, 0, 0] + sym[0, 0, 0]

    def k3_outputs(w2, tabw, lim2, c01):
        m = ws.words_matrix_device(w2, -(-p["steps_p"] // 32))
        sym, val, cntmap, exmap, mrowmap = ws.k1_scan2(
            m, tabw, lim2, c01, **kw)
        HP = cntmap.shape[0]
        lane_iota = jnp.arange(G, dtype=jnp.int32)
        bmask = jnp.zeros(G, dtype=bool)
        for g in st["last_live"]:
            bmask = bmask | (lane_iota == g)
        ex2 = jnp.where(bmask[None, :], 0, exmap.reshape(HP, G))
        exmap = ex2.reshape(HP, R, 128)

        def to_k2(mm):
            m2 = (mm.reshape(HP, G).T.reshape(p["NG"], p["Rg"], HP)
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
        msym, mval = ws.k3_fix2(
            m, tabw, entry.reshape(R, 128), cut.reshape(R, 128),
            cut_slot.reshape(R, 128), sym, val, c01, G=G,
            steps_p=p["steps_p"], SEG=p["SEG"], UNROLL=p["UNROLL"], md=md,
            C0=0, C1=0, NS=1, RB=p["RB"], tab_bounds=st["tab_bounds"])
        return msym, mval, n, entry

    @jax.jit
    def upto_k2(w2, tabw, lim2, c01):
        m = ws.words_matrix_device(w2, -(-p["steps_p"] // 32))
        sym, val, cntmap, exmap, mrowmap = ws.k1_scan2(
            m, tabw, lim2, c01, **kw)
        HP = cntmap.shape[0]

        def to_k2(mm):
            m2 = (mm.reshape(HP, G).T.reshape(p["NG"], p["Rg"], HP)
                  .transpose(1, 0, 2))
            return jnp.pad(m2, ((0, 0), (0, 0), (0, 128 - HP)))

        ent3, _ = ws.k2_compose(to_k2(exmap), jnp.zeros((1, 1), jnp.int32),
                                Rg=p["Rg"], NG=p["NG"])
        return ent3[0, 0, 0].astype(jnp.int32) + sym[0, 0, 0]

    @jax.jit
    def upto_k3(w2, tabw, lim2, c01):
        msym, mval, n, _ = k3_outputs(w2, tabw, lim2, c01)
        return n[0] + msym[0, 0, 0] + mval[0, 0, 0].astype(jnp.int32)

    def full():
        return pb.batch_decode_program(
            st["words"], st["tabw"], st["lim2"], st["c01"], B=p["B"], H=H,
            G=G, steps=p["steps"], steps_p=p["steps_p"], SEG=p["SEG"],
            UNROLL=p["UNROLL"], md=md, Rg=p["Rg"], NG=p["NG"], ORP=p["ORP"],
            RB=p["RB"], tab_bounds=st["tab_bounds"],
            last_live=st["last_live"])

    w2, tw, l2, c01 = st["words"], st["tabw"], st["lim2"], st["c01"]
    t0 = timeit(lambda: staging_only(w2), lambda o: o)
    print(f"staging only: {t0*1e3:7.3f} ms", flush=True)
    t1 = timeit(lambda: upto_k1(w2, tw, l2, c01), lambda o: o)
    print(f"K1          : {t1*1e3:7.3f} ms", flush=True)
    t2 = timeit(lambda: upto_k2(w2, tw, l2, c01), lambda o: o)
    print(f"K1+K2       : {t2*1e3:7.3f} ms  (K2 ~ {max(t2-t1,0)*1e3:.3f})",
          flush=True)
    t3 = timeit(lambda: upto_k3(w2, tw, l2, c01), lambda o: o)
    print(f"K1..K3      : {t3*1e3:7.3f} ms  (K3 ~ {max(t3-t2,0)*1e3:.3f})",
          flush=True)
    t4 = timeit(full, lambda o: o[3])
    print(f"full        : {t4*1e3:7.3f} ms  (K4 ~ {max(t4-t3,0)*1e3:.3f})",
          flush=True)

    msym, mval, n, entry = jax.jit(k3_outputs)(w2, tw, l2, c01)
    msym.block_until_ready()
    tk4 = timeit(lambda: ws.k4_compact(msym, mval, G=G, cells_p=cells_p,
                                       ORP=p["ORP"]),
                 lambda o: o[0, :1])
    print(f"K4 alone    : {tk4*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
