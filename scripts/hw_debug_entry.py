"""Compare widescan's HW-computed entries/maps vs the XLA reference path.

Ground truth: ops/lanedfa's _candidate_scan + _compose on the same lane
geometry (CPU or TPU XLA — bit-validated in round 1).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "news"
    from huffmandecoderongpus_tpu import data
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws
    from huffmandecoderongpus_tpu.ops import lanedfa as ld

    td = data.load_test_data(corpus)
    hf = td.cd
    dfa = ld.build_lane_dfa(hf.tree)
    H = max(dfa.height, 1)
    md = max(dfa.min_depth, 1)
    avg = hf.bits / max(hf.uncompressed_size, 1)
    p = ws._plan(hf.bits, H, md, avg_len=avg)
    G, B = p["G"], p["B"]
    R = G // 128
    print(f"{corpus}: plan {p}", flush=True)

    tabw = jnp.asarray(ws.pack_pair_table(dfa))
    w2 = ws.payload_lane_words(hf.payload, hf.bits, G, B)
    bits3 = ws.words_matrix_device(jnp.asarray(w2), -(-p["steps_p"] // 32))
    lane = np.arange(G, dtype=np.int64).reshape(R, 128)
    lim2 = jnp.asarray(np.clip(hf.bits - lane * B, -(1 << 30),
                               1 << 30).astype(np.int32))
    kw = dict(B=B, H=H, G=G, steps=p["steps"], steps_p=p["steps_p"],
              SEG=p["SEG"], UNROLL=p["UNROLL"], md=md)
    sym, val, cntmap, exmap, mrowmap = ws.k1_scan(bits3, tabw, lim2, **kw)
    HP = cntmap.shape[0]
    ent3, _tot = ws.k2_compose(
        jnp.pad(exmap.reshape(HP, G).T.reshape(p["NG"], p["Rg"], HP)
                .transpose(1, 0, 2), ((0, 0), (0, 0), (0, 128 - HP))),
        jnp.zeros((1, 1), jnp.int32), Rg=p["Rg"], NG=p["NG"])
    entry = np.asarray(ent3[:, :, 0].T.reshape(G)).astype(np.int64)
    cnt2 = np.asarray(cntmap).reshape(HP, G)
    ex2 = np.asarray(exmap).reshape(HP, G)
    mrow2 = np.asarray(mrowmap).reshape(HP, G)

    # ---- XLA ground truth (same B, G, same lane geometry) ----------------
    mat2, B2 = ld.bits_matrix(hf.payload, hf.bits, G, H, round_to=B)
    assert B2 == B, (B2, B)
    cntX, exX = ld._candidate_scan(
        jnp.asarray(mat2), jnp.asarray(dfa.entry), B=B, H=H, N=hf.bits, G=G)
    entX, baseX, nX, totX = ld._compose(cntX, exX, G=G)
    entX = np.asarray(entX).astype(np.int64)
    cntX = np.asarray(cntX)
    exX = np.asarray(exX)

    n_live = int((np.arange(G) * B < hf.bits).sum())
    em = entry[:n_live] != entX[:n_live]
    print(f"entry mismatches: {em.sum()}/{n_live} "
          f"first {np.nonzero(em)[0][:8]}", flush=True)
    # compare maps at the TRUE entries for live lanes
    gl = np.arange(n_live)
    cnt_w = cnt2[entX[:n_live], gl]
    cnt_x = cntX[entX[:n_live], gl]
    cm = cnt_w != cnt_x
    print(f"cnt-map mismatches at true entries: {cm.sum()} "
          f"first {np.nonzero(cm)[0][:8]}", flush=True)
    ex_w = ex2[entX[:n_live], gl]
    ex_x = exX[entX[:n_live], gl]
    xm = ex_w != ex_x
    print(f"exit-map mismatches at true entries: {xm.sum()} "
          f"first {np.nonzero(xm)[0][:8]}", flush=True)
    mr = mrow2[entX[:n_live], gl]
    deep = (entX[:n_live] != 0) & (mr + 1 > p["steps_p"])
    print(f"legit deep-cut lanes: {deep.sum()} "
          f"(mrow quantiles {np.percentile(mr[entX[:n_live] != 0], [50, 95, 99.9]) if (entX[:n_live] != 0).any() else '-'})",
          flush=True)
    if cm.any():
        g0 = int(np.nonzero(cm)[0][0])
        print(f"lane {g0}: entry={entX[g0]} cnt_w={cnt_w[g0]} cnt_x={cnt_x[g0]} "
              f"mrow={mr[g0]} rec-like ex_w={ex_w[g0]} ex_x={ex_x[g0]}",
              flush=True)
        print("cnt col wide:", cnt2[:H, g0], flush=True)
        print("cnt col xla: ", cntX[:H, g0], flush=True)
        print("mrow col    :", mrow2[:H, g0], flush=True)


if __name__ == "__main__":
    main()
