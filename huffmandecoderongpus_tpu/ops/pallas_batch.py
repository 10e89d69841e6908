"""Batched multi-stream decode: N independent streams in ONE program.

Round-4 measurement itemized the small-corpus cost to this environment's
~0.11 ms per-PROGRAM dispatch floor (DESIGN.md): each stream decoded on
its own pays the floor once, so the reference's back-to-back small-corpus
suites (`bigtable` decodes 5 corpora in one process,
/root/reference/framework/mainrun.c:541-588) are dispatch-bound here no
matter how fast the kernels are.  This module amortizes the floor by
decoding N streams in ONE jitted widescan program:

  * Every stream keeps its OWN Huffman table: the stacked compact quad
    tables (an 8-row block per stream — two live rows + Mosaic sublane
    padding) are selected per ROW GROUP by the table
    BlockSpec's index map (k1_scan2/k3_fix2 ``tab_bounds``) — streams
    occupy disjoint row-group ranges, so table selection costs ZERO
    extra gathers in the hot loop (vs an NS-chunked table, which would
    pay one gather per chunk per step).
  * Lanes share a common bit length B (the largest stream's natural
    plan); each stream gets ceil(bits/B) live lanes padded to whole
    1024-lane blocks.  Pad lanes and common-B tails are skipped by the
    kernel's dead-segment gate (zero-write, no scan) so padding costs
    HBM writes, not VPU issue.
  * Per-lane root-children words (C0 | C1<<16) ride as a lane input for
    the partial-entry paths (``c01``); min-depth/height are the batch's
    min/max (md gates slot packing validity, H the candidate count).
  * One K2 composition covers the whole lane axis: stream-final lanes'
    exit maps are zeroed, so each stream's first lane composes to entry
    0 (pad lanes already guarantee this; the explicit zero keeps the
    invariant when a stream exactly fills its block).
  * One K4 compaction with the batch-max dense buffer; per-128-lane-row
    count gating keeps its work proportional to actual symbols.

Decoded bytes come back dense per lane; the host splits per stream and
trims by counts.  Streams outside the batch envelope (md=1 trees, >127
states) or overflowing the dense buffer fall back to their individual
``decode_widescan`` call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from huffmandecoderongpus_tpu.ops.lanedfa import build_lane_dfa
from huffmandecoderongpus_tpu.ops.pallas_widescan import (
    CELL,
    MAX_STATES,
    EnvelopeError,
    _plan,
    _select_h,
    k1_scan2,
    k2_compose,
    k3_fix2,
    k4_compact,
    pack_quad_tables,
    payload_lane_words,
    words_matrix_device,
)

#: lane-block granularity per stream.  Swept on the v5e (round 5, same
#: session, paper1+news+book2 and 5x paper1-class):
#:
#:   | config              | trio (3 streams) | 5 small streams |
#:   |---------------------|------------------|-----------------|
#:   | LB=1024, natural B  | 1.15 ms          | **0.53 ms**     |
#:   | LB=2048, B=1504     | **1.01 ms**      | —               |
#:   | LB=4096, B=bits/4k  | 1.23 ms          | 0.79 ms         |
#:   | sum of solo decodes | 0.66-0.89 ms     | 0.69 ms         |
#:
#: Near-natural lanes win: short common-B lanes multiply candidate
#: chains (the ~500 symbols/lane rule), and the wider-RB pipelining of
#: 4096-lane blocks never recovers that.  The batch BEATS the solo sum
#: only where the per-program dispatch floor dominates every member
#: (N floor-bound streams: +23% at 5 paper1-class streams, ONE dispatch
#: instead of N); for multi-Mbit members the shared-geometry costs
#: exceed the N-1 saved floors and per-stream routed decodes are faster
#: on this relay.  Callers choose; the knobs stay overridable.
LANE_BLOCK = 1024

#: floor for the shared lane bit length: keeps entry offsets (< H) and
#: the candidate halo well inside a lane for every supported tree
MIN_B = 128


def stage_batch_inputs(hfs, B=None, md_force=None, lane_block=None):
    """Stage N HuffFiles for one batched decode.  Raises EnvelopeError
    when any stream's tree is outside the batch envelope (md < 2 or
    > 127 internal states — the compact-table requirement that makes
    per-row-group table blocks free).

    ``md_force``: clamp the batch min-depth (running at a SMALLER md
    than the trees' true minimum is always valid — slots just pack less
    densely).  md=2 keeps SEG at 32 bits, which streams whole word
    blocks per segment with STATIC in-kernel row addressing; odd-md
    segments hold the whole matrix per row group and address word rows
    dynamically (measured slower per bit on v5e — see DESIGN.md
    round-5 batch table)."""
    if not hfs:
        raise ValueError("empty batch")
    dfas, Hs, mds, avgs = [], [], [], []
    for hf in hfs:
        dfa = build_lane_dfa(hf.tree)
        n_states = dfa.entry.shape[0] // 2
        if n_states > MAX_STATES:
            raise EnvelopeError(
                f"{n_states} states > {MAX_STATES}: batched tables "
                "require the compact layout")
        md = max(dfa.min_depth, 1)
        if md < 2:
            raise EnvelopeError("md=1 tree outside the chunked batch path")
        if hf.bits <= 0:
            raise EnvelopeError("empty stream")
        dfas.append(dfa)
        Hs.append(max(dfa.height, 1))
        mds.append(md)
        avgs.append(hf.bits / max(hf.uncompressed_size, 1))
    H = max(Hs)
    md = min(mds)
    if md_force is not None:
        md = max(2, min(md, int(md_force)))
    UNROLL = 4 * md
    SEG = UNROLL * max(1, 32 // UNROLL)
    lane_block = int(lane_block or LANE_BLOCK)
    if B is None:
        # the largest stream sets the common lane length (its natural
        # plan geometry — the ~500 symbols/lane optimum; see the
        # LANE_BLOCK sweep table); smaller streams get fewer,
        # same-length lanes — their total scan work stays ~their own
        # bit count
        k_big = int(np.argmax([hf.bits for hf in hfs]))
        p_big = _plan(hfs[k_big].bits, H, md, avg_len=avgs[k_big])
        B = p_big["B"]
    # the MIN_B floor applies to explicit B too: entry offsets (< H) and
    # the candidate halo must sit well inside a lane
    B = -(-max(MIN_B, int(B)) // 32) * 32
    steps = B + H
    steps_p = -(-steps // SEG) * SEG
    hard = min(B // md + 2, steps_p // md)

    g0, g_live, g_pad = [], [], []
    tabs, c01s, lims, words = [], [], [], []
    ORP = 0
    total_G = 0
    for k, hf in enumerate(hfs):
        live = max(1, -(-hf.bits // B))
        Gk = -(-live // lane_block) * lane_block
        g0.append(total_G)
        g_live.append(live)
        g_pad.append(Gk)
        total_G += Gk
        tabq, C0, C1, NS = pack_quad_tables(dfas[k])
        assert NS == 1  # guaranteed by the MAX_STATES check
        # 8-row block per stream (Mosaic sublane block divisibility):
        # rows 0-1 are the quad-table pair, rows 2-7 pad
        tab8 = np.zeros((8, 128), np.int32)
        tab8[:2] = tabq
        tabs.append(tab8)
        c01s.append(np.full((Gk // 128, 128), C0 | (C1 << 16), np.int32))
        lane = np.arange(Gk, dtype=np.int64).reshape(Gk // 128, 128)
        lims.append(np.clip(hf.bits - lane * B, -(1 << 30),
                            1 << 30).astype(np.int32))
        words.append(payload_lane_words(hf.payload, hf.bits, Gk, B))
        ORP = max(ORP, min(int(B / avgs[k] * 1.25) + 66, hard))
    ORP = -(-ORP // 128) * 128
    G = total_G
    R = G // 128
    # row-group blocking: largest HW-validated block dividing every
    # stream's row count (all multiples of 8 at the default 1024-lane
    # block; an override below 1024 lanes could leave no valid block —
    # EnvelopeError rather than a silently truncated grid)
    for rb in (32, 16, 8):
        if all((g // 128) % rb == 0 for g in g_pad):
            RB = rb
            break
    else:
        raise EnvelopeError(
            f"lane block {lane_block} leaves stream row counts "
            f"{[g // 128 for g in g_pad]} with no valid row-group block")
    # static row-group boundaries between streams (for the table index
    # maps) and the stream-final live lanes (for the exit-map reset)
    tab_bounds = tuple(np.cumsum([g // 128 // RB for g in g_pad])[:-1])
    last_live = tuple(g0[k] + g_live[k] - 1 for k in range(len(hfs)))
    # K2 split: the _plan rule on the total lane count (NG is a pow2
    # <= 1024, so it divides the LANE_BLOCK-multiple G)
    NG = 1 << ((R).bit_length() // 2 + 3)
    NG = min(NG, G)
    Rg = G // NG
    plan = dict(B=B, steps=steps, steps_p=steps_p, SEG=SEG, UNROLL=UNROLL,
                G=G, RB=RB, ORP=ORP, NG=NG, Rg=Rg)
    return dict(plan=plan, H=H, md=md, tab_bounds=tab_bounds,
                last_live=last_live, g0=tuple(g0), g_live=tuple(g_live),
                g_pad=tuple(g_pad),
                tabw=jnp.asarray(np.concatenate(tabs, axis=0)),
                c01=jnp.asarray(np.concatenate(c01s, axis=0)),
                lim2=jnp.asarray(np.concatenate(lims, axis=0)),
                words=jnp.asarray(np.concatenate(words, axis=0)))


@functools.partial(jax.jit, static_argnames=(
    "B", "H", "G", "steps", "steps_p", "SEG", "UNROLL", "md", "Rg", "NG",
    "ORP", "RB", "tab_bounds", "last_live", "interpret"))
def batch_decode_program(w2, tabw, lim2, c01, *, B, H, G, steps, steps_p,
                         SEG, UNROLL, md, Rg, NG, ORP, RB, tab_bounds,
                         last_live, interpret=False):
    """The fused batched decode: staging transpose -> K1 (per-row-group
    tables) -> one boundary-reset K2 -> K3 -> K4.  Returns (denseT
    (G, ORP) u8, n (G,) i32, total i32, fence i32) — the same contract
    as wide_decode_program, over all N streams' lanes."""
    R = G // 128
    cells_p = steps_p // md // CELL
    wmat = words_matrix_device(w2, -(-steps_p // 32))
    sym, val, cntmap, exmap, mrowmap = k1_scan2(
        wmat, tabw, lim2, c01, B=B, H=H, G=G, steps=steps,
        steps_p=steps_p, SEG=SEG, UNROLL=UNROLL, md=md, C0=0, C1=0, NS=1,
        RB=RB, tab_bounds=tab_bounds, interpret=interpret)

    HP = cntmap.shape[0]
    # reset composition at stream boundaries: the stream-final live
    # lane's exit map is zeroed, so the next stream's first lane (and
    # every pad lane after it) composes to entry 0
    lane_iota = jnp.arange(G, dtype=jnp.int32)
    bmask = jnp.zeros(G, dtype=bool)
    for g in last_live:
        bmask = bmask | (lane_iota == g)
    ex2 = jnp.where(bmask[None, :], 0, exmap.reshape(HP, G))
    exmap = ex2.reshape(HP, R, 128)

    def to_k2(m):
        m2 = m.reshape(HP, G).T.reshape(NG, Rg, HP).transpose(1, 0, 2)
        return jnp.pad(m2, ((0, 0), (0, 0), (0, 128 - HP)))

    ent3, _tot = k2_compose(to_k2(exmap), jnp.zeros((1, 1), jnp.int32),
                            Rg=Rg, NG=NG, interpret=interpret)
    entry = ent3[:, :, 0].T.reshape(G).astype(jnp.int32)

    cnt2 = cntmap.reshape(HP, G)
    n = _select_h(cnt2, entry, H)
    total = jnp.sum(n)

    mrow_sel = _select_h(mrowmap.reshape(HP, G), entry, H)
    cut = jnp.where(entry == 0, 0, mrow_sel + 1)
    cut = jnp.where(lim2.reshape(G) > 0, cut, 0)
    cut_slot = jnp.where(cut > 0, (cut - 1) // md + 1, 0)

    msym, mval = k3_fix2(wmat, tabw, entry.reshape(R, 128),
                         cut.reshape(R, 128), cut_slot.reshape(R, 128),
                         sym, val, c01, G=G, steps_p=steps_p, SEG=SEG,
                         UNROLL=UNROLL, md=md, C0=0, C1=0, NS=1, RB=RB,
                         tab_bounds=tab_bounds, interpret=interpret)
    denseT = k4_compact(msym, mval, G=G, cells_p=cells_p, ORP=ORP,
                        interpret=interpret)
    fence = total + denseT[0, 0].astype(jnp.int32)
    return denseT, n, total, fence


#: auto-split threshold: streams at or above this many compressed bits
#: decode individually even when passed to decode_widescan_batch — the
#: measured decision rule (see LANE_BLOCK) says a batch only wins where
#: the dispatch floor dominates every member, and by ~0.5 Mbit a
#: stream's own device time already exceeds the floor it would save.
BATCH_SOLO_BITS = 1 << 19


def decode_widescan_batch(hfs, B=None, check_size=True, interpret=False,
                          auto_split=True):
    """Decode N HuffFiles, batching the floor-bound members into ONE
    device program; returns a list of byte arrays in input order.

    ``auto_split`` (default): members with >= BATCH_SOLO_BITS compressed
    bits — where the measured decision rule says the shared-geometry
    costs exceed the saved dispatch floor — are decoded individually
    through ``decode_widescan``'s routed path, and the batch covers only
    the small members (all of them, when fewer than two are small).
    Pass ``auto_split=False`` to force every stream into one program
    (the measurement configuration of scripts/hw_batch.py).

    Streams outside the batch envelope raise EnvelopeError from staging
    (callers fall back); a stream whose lane overflows the shared dense
    buffer is re-decoded individually (decode_widescan's own fallback
    chain) without failing the rest of the batch."""
    from huffmandecoderongpus_tpu.ops.pallas_widescan import decode_widescan

    if auto_split:
        small = [k for k, hf in enumerate(hfs)
                 if hf.bits < BATCH_SOLO_BITS]
        if len(small) < len(hfs):
            small_set = set(small) if len(small) >= 2 else set()
            outs = [None] * len(hfs)
            if small_set:
                batched = decode_widescan_batch(
                    [hfs[k] for k in small], B=B, check_size=check_size,
                    interpret=interpret, auto_split=False)
                for k, out in zip(small, batched):
                    outs[k] = out
            for k, hf in enumerate(hfs):
                if k not in small_set:
                    outs[k] = decode_widescan(hf, check_size=check_size,
                                              interpret=interpret)
            return outs

    st = stage_batch_inputs(hfs, B=B)
    p = st["plan"]
    denseT, n, _total, _fence = batch_decode_program(
        st["words"], st["tabw"], st["lim2"], st["c01"], B=p["B"],
        H=st["H"], G=p["G"], steps=p["steps"], steps_p=p["steps_p"],
        SEG=p["SEG"], UNROLL=p["UNROLL"], md=st["md"], Rg=p["Rg"],
        NG=p["NG"], ORP=p["ORP"], RB=p["RB"],
        tab_bounds=st["tab_bounds"], last_live=st["last_live"],
        interpret=interpret)
    dense = np.asarray(denseT)
    counts = np.asarray(n)
    outs = []
    for k, hf in enumerate(hfs):
        g0, gl = st["g0"][k], st["g_pad"][k]
        ck = counts[g0:g0 + gl]
        if ck.max(initial=0) > p["ORP"]:
            outs.append(decode_widescan(hf, check_size=check_size,
                                        interpret=interpret))
            continue
        mask = np.arange(p["ORP"])[None, :] < ck[:, None]
        out = dense[g0:g0 + gl][mask]
        if check_size and out.size != hf.uncompressed_size:
            raise RuntimeError(
                f"stream {k}: emitted {out.size} symbols, header says "
                f"{hf.uncompressed_size}")
        outs.append(out)
    return outs
