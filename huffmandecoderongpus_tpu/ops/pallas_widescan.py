"""Wide-lane fused Pallas decoder: dense output on device, one bits pass.

Round-1's kernels (ops/pallas_lanedfa.py) scan one (8,128) lane tile per
grid step — a latency-bound shape (measured ~36 cycles/vector-op on the
main scan).  This module restructures the decode so every DFA step is a
*(R,128)* = all-G-lanes vector operation (R = G/128 sublane rows), which
keeps the VPU throughput-bound, and fuses the whole decode into four
kernels inside one XLA program:

  K1  main scan + self-synchronizing candidate discovery
      - the stream is cut into G lanes of B bits; the kernel reads raw
        *payload words*: word w of lane r*128+c is wmat[w, r, c], and a
        2-bit chunk is two static shifts + masks off the VMEM-resident
        word row (round 4; previously a host-built per-bit/per-chunk u8
        matrix — 16x the staging work and VMEM traffic).  Stream-end
        handling is a per-chunk limit compare against the per-lane bit
        count (replaces the round-3 in-data PAD values and the
        reference's explicit size checks, pes.c:30-46).
      - one *paired* transition table word per state (word = entry(bit=0)
        | entry(bit=1)<<16) makes a step a single 128-wide lane gather +
        shifts up to 127 internal states (all 8 reference corpora
        qualify); deeper trees — up to 1023 states, md=1 included —
        chunk the table into NS 128-state rows with a wide 16-bit entry
        layout (see pack_pair_table), costing one extra gather + select
        per extra chunk.
      - compact 16-bit entries store the *post-step state* directly
        (round 4): an emitting chunk's next state is static per entry
        (pos==1 -> root, pos==0 -> the root child of the chunk's second
        bit), so the hot loop's next-state is one AND — no root-child
        select chain; the emission position is recovered as
        emit & (state == 0) only where needed.
      - emissions land in *slot* rows j // md (md = min code length): two
        emissions can never share a slot (consecutive codewords are >= md
        bits apart), so this is a lossless 2-3x densification that
        shrinks the compaction search space.
      - every lane's "0-chain" (entry offset 0) is the main scan; the
        true entry offset of lane g+1 is where lane g's chain exits
        ([0, H)); instead of scanning all H candidate chains to the lane
        end (round-1's candidate kernel, 3x the main scan), candidates
        walk only until they *merge* with the 0-chain (first emission on
        a row where the 0-chain emitted - Huffman self-synchronization,
        cf. ops/lanedfa_sync.py) or exit; whole candidate segments are
        skipped once every chain is resolved (checked once per segment).
  K2  composition: per-lane candidate exit maps fold into per-lane true
      entry offsets via a sqrt(G) two-level scheme (in-group fori, then
      log-depth prefix-doubling over groups with sublane rolls) - all
      128-wide lane gathers, ~30us, replacing the sequential host loop of
      the reference (pes.c:151-185).
  K3  fix + splice scan: lanes whose true entry is nonzero re-decode
      rows up to their merge row (adaptively gated per segment — the
      window cannot be statically bounded) and the fixed rows are
      spliced into the main scan's sym/val slot arrays *in place*
      (aliased outputs), so no XLA pass touches the full-size emissions.
  K4  compaction: per-lane CELL-packed emissions -> per-lane *dense*
      symbol prefixes + counts.  The scans store 4 slots per int32
      "cell" (a symbol byte per slot + a u8 valid nibble), shrinking
      the compaction search space and the valid-mask HBM traffic 4x at
      zero scan cost; the lane transpose runs in-kernel (Mosaic lowers
      2D transposes natively), a popcount prefix sum runs per 128-cell
      window, and each output rank resolves directly — per-lane window
      select, 7-step binary-search gather (Mosaic's dynamic_gather is
      lane-axis, width-128 only), nibble-popcount byte select — with
      no separate window-merge stage.  The benchmarked decode
      therefore ends with dense bytes + counts in HBM; the host only
      trims/concatenates.

Staging (round 4, the copy/compute-overlap analog of the reference's
two-stream upload pipeline, fastgpuOpt1.cu:197-241): the only host-side
per-decode work is one padded copy of the payload bytes into a (G, B/32)
little-endian word array (`payload_lane_words`); the halo'd
(steps_w, R, 128) word matrix the kernels read is built ON DEVICE by one
XLA transpose inside the decode program (`words_matrix_device`).

Reference semantics covered: decode-from-every-bit + combine
(/root/reference/framework/pes.c:30-104) with the per-level host readback
(fastgpu.cu:245-261) replaced by the fused on-device composition.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from huffmandecoderongpus_tpu.ops.lanedfa import EMIT_BIT, STATE_MASK, LaneDFA

MAX_STATES = 127  # paired-table limit: state field is 7 bits
# Emissions are stored packed CELL slots per int32 "cell": byte cs of the
# cell word is the symbol of slot 4*cell+cs and a u8 nibble carries the
# per-slot valid bits.  _plan guarantees segments cover whole cells
# (SEG % (CELL*md) == 0); the packing shrinks K4's compaction search
# space and the valid-mask HBM traffic 4x at zero extra scan cost.
CELL = 4

MAX_STATES_WIDE = 1023  # LaneDFA STATE_MASK bound; wide entries hold 15 bits

#: below this many compressed bits, decode_widescan routes to the
#: single-dispatch one-shot kernel when it fits VMEM (measured round 4,
#: natural sub-4Mbit geometry: the per-program dispatch floor ~0.11 ms
#: dominates small streams; the one-shot wins on paper1 (0.119 vs
#: 0.127 ms) and news at ~2 Mbit (0.272 vs 0.322), loses book2 at 3
#: (0.516 vs 0.397) — threshold between the two)
ONESHOT_MAX_BITS = 1 << 21

#: follower chains per gated candidate region: a region stays live until
#: its LAST chain resolves across all RB*128 lanes, so the straggler tail
#: costs one region width — smaller groups pay more scalar gates but
#: strand less vector work behind each straggler (swept on kjv, round 4)
GROUP_W = 6


# ---------------------------------------------------------------------------
# Table packing


def pack_pair_table(dfa: LaneDFA) -> np.ndarray:
    """Repack the fused table as one int32 word per state:
    word = e0 | e1<<16.  Returns (NS, 128) int32 — row c holds states
    [c*128, c*128+128); NS = 1 up to 127 states.

    Two 16-bit entry layouts (mirrors pack_quad_tables): up to 127
    states the compact layout e = sym<<8 | emit<<7 | next_state with
    non-emitting sym bits zero (slot-accumulation can OR) and the
    emitting next state = 0 (root reset); beyond that the *wide* layout
    (emit<<15 | sym<<1 when emitting — post-emission state is the root —
    or a bare state <= 32767) so md=1 trees up to 1023 internal states
    stay on the fused path.  Raises ValueError beyond MAX_STATES_WIDE."""
    n_states = dfa.entry.shape[0] // 2
    if n_states > MAX_STATES_WIDE:
        raise ValueError(
            f"{n_states} states > {MAX_STATES_WIDE} (wide paired table)")
    big = n_states > MAX_STATES
    NS = max(1, -(-n_states // 128))
    out = np.zeros((NS, 128), dtype=np.int64)
    flat = out.reshape(-1)
    for bit in (0, 1):
        e = dfa.entry[bit::2].astype(np.int64)
        emit = (e & EMIT_BIT) != 0
        state = np.where(emit, 0, e & STATE_MASK)
        sym = np.where(emit, (e >> 16) & 0xFF, 0)
        if big:
            e16 = np.where(emit, 0x8000 | (sym << 1), state)
        else:
            e16 = (sym << 8) | (emit.astype(np.int64) << 7) | state
        flat[:n_states] |= e16 << (16 * bit)
    return out.astype(np.uint32).view(np.int32)


def pack_quad_tables(dfa: LaneDFA):
    """(2 * NS, 128) int32 quad tables + (C0, C1, NS).  Row b0*NS + c
    holds states [c*128, c*128+128), selected by the chunk's first bit;
    the second bit picks the 16-bit half.  Requires md >= 2 (caller
    checks).

    Two 16-bit entry layouts: up to 127 states the compact layout
    sym<<8 | emit<<7 | post_state — the post-chunk state is static per
    entry (pos==1 -> 0/root, pos==0 -> C[b1]), so the kernels take the
    next state unconditionally from the low 7 bits, and the emission
    position is recovered as emit & (post==0) (root children C0/C1 are
    internal, never 0).  Non-emitting entries carry sym bits zero (the
    cell accumulation can OR).  Beyond 127 states the *wide* layout
    (emit<<15 | sym<<1 | pos when emitting, bare state <= 32767
    otherwise) with one extra select per kernel step."""
    n_states = dfa.entry.shape[0] // 2
    if n_states > MAX_STATES_WIDE:
        raise ValueError(
            f"{n_states} states > {MAX_STATES_WIDE} (wide quad table)")
    big = n_states > MAX_STATES
    NS = max(1, -(-n_states // 128))
    ent = dfa.entry.astype(np.int64)

    C = []
    for b in (0, 1):
        if ent[b] & EMIT_BIT:
            raise ValueError("md < 2: root child is a leaf")
        C.append(int(ent[b] & STATE_MASK))

    def emit16(e, pos, b1):
        sym = int((e >> 16) & 0xFF)
        if big:
            return 0x8000 | (sym << 1) | pos
        post = 0 if pos == 1 else C[b1]
        return (sym << 8) | 0x80 | post

    # accumulate in int64: a sign-bit-setting entry in the high
    # half-word would overflow a python-int -> int32 store; the final
    # astype wraps to the int32 bit pattern the kernel expects
    out = np.zeros((2 * NS, 128), dtype=np.int64)
    for st in range(n_states):
        for b0 in (0, 1):
            e0 = ent[2 * st + b0]
            for b1 in (0, 1):
                if e0 & EMIT_BIT:
                    e16 = emit16(e0, 0, b1)
                else:
                    s1 = int(e0 & STATE_MASK)
                    e1 = ent[2 * s1 + b1]
                    if e1 & EMIT_BIT:
                        e16 = emit16(e1, 1, b1)
                    else:
                        e16 = int(e1 & STATE_MASK)
                out[b0 * NS + st // 128, st % 128] |= e16 << (16 * b1)
    return out.astype(np.uint32).view(np.int32), C[0], C[1], NS


# ---------------------------------------------------------------------------
# Word staging: host pads payload bytes into lane-major words; the halo'd
# word matrix the kernels read is built on device (one XLA transpose).


def payload_lane_words(payload: np.ndarray, bits: int, G: int,
                       B: int) -> np.ndarray:
    """(G, B//32) int32 lane-major payload words: word w of lane g holds
    stream bits [g*B + 32w, g*B + 32w + 32), LSB-first (bit p of the
    stream is bit p%32 of word p//32 — the `.huff` bit order,
    huffdata.c:55-61 / mainrun.c:45, viewed little-endian).  Bits at or
    past the stream end are ZERO: the kernels' per-lane limit compare is
    the pad test, so zeros here are never decoded — except a straddling
    chunk's harmless literal-0 second bit (md >= 2: one bit can neither
    complete a fresh codeword nor emit from the root)."""
    assert B % 32 == 0
    nbytes = G * B // 8
    buf = np.zeros(nbytes, dtype=np.uint8)
    nb = min(int(payload.size), nbytes)
    buf[:nb] = payload[:nb]
    full, rem = divmod(bits, 8)
    if full < nb:
        if rem:
            buf[full] &= (1 << rem) - 1
            buf[full + 1:nb] = 0
        else:
            buf[full:nb] = 0
    return buf.view("<u4").view(np.int32).reshape(G, B // 32)


def words_matrix_device(w2: jnp.ndarray, steps_w: int) -> jnp.ndarray:
    """Device-side staging pass: (G, BW) lane words -> (steps_w, R, 128)
    halo'd word matrix.  Word rows >= BW are the following lanes' first
    words (candidate chains read up to ~H bits past the lane end), built
    by lane-shifted copies of the transposed main block — all XLA, no
    gather; the host's only per-decode work stays the padded word copy
    (the device-side counterpart of the reference's upload/compute
    overlap, fastgpuOpt1.cu:197-241)."""
    G, BW = w2.shape
    R = G // 128
    main = w2.T  # (BW, G)
    rows = [main]
    need = steps_w - BW
    k = 1
    while need > 0:
        take = min(BW, need)
        rows.append(jnp.concatenate(
            [main[:take, k:], jnp.zeros((take, k), jnp.int32)], axis=1))
        need -= take
        k += 1
    return jnp.concatenate(rows, axis=0).reshape(steps_w, R, 128)


# ---------------------------------------------------------------------------
# Entry decode helpers


def _pair_word(tab_ref, NS, rows, node):
    """Paired-table word for each lane: table[node], NS 128-state chunks
    (row c of tab_ref holds states [c*128, c*128+128))."""
    if NS == 1:
        tb = jnp.broadcast_to(tab_ref[0:1, :], (rows, 128))
        return jnp.take_along_axis(tb, node, axis=1)
    nl = node & 127
    nh = node >> 7
    w = None
    for c in range(NS):
        t = jnp.broadcast_to(tab_ref[c:c + 1, :], (rows, 128))
        g = jnp.take_along_axis(t, nl, axis=1)
        w = g if c == 0 else jnp.where(nh == c, g, w)
    return w


def _e1_fields(e, NS):
    """(emit, sym32, nst) of a 16-bit 1-bit-path entry; layout per
    pack_pair_table (wide iff NS > 1).  ``sym32`` arrives emit-masked
    in both layouts (the compact layout's non-emitting sym is zero by
    construction)."""
    if NS > 1:
        emit = (e >> 15) & 1
        return emit, emit * ((e >> 1) & 0xFF), (1 - emit) * (e & 0x7FFF)
    return (e >> 7) & 1, e >> 8, e & 127


def _quad_word(tab_ref, NS, rows, node, b0=None):
    """Quad-table words for each lane: table[.][node], NS 128-state
    chunks (row b0*NS + c of tab_ref holds states [c*128, c*128+128)).
    Returns the b0-selected word, or the (w0, w1) pair when b0 is None
    (so callers can select at a broadcast-friendlier shape)."""
    if NS == 1:
        tb0 = jnp.broadcast_to(tab_ref[0:1, :], (rows, 128))
        tb1 = jnp.broadcast_to(tab_ref[1:2, :], (rows, 128))
        w0 = jnp.take_along_axis(tb0, node, axis=1)
        w1 = jnp.take_along_axis(tb1, node, axis=1)
    else:
        nl = node & 127
        nh = node >> 7
        w0 = w1 = None
        for c in range(NS):
            t0 = jnp.broadcast_to(tab_ref[c:c + 1, :], (rows, 128))
            t1 = jnp.broadcast_to(tab_ref[NS + c:NS + c + 1, :],
                                  (rows, 128))
            g0 = jnp.take_along_axis(t0, nl, axis=1)
            g1 = jnp.take_along_axis(t1, nl, axis=1)
            w0 = g0 if c == 0 else jnp.where(nh == c, g0, w0)
            w1 = g1 if c == 0 else jnp.where(nh == c, g1, w1)
    if b0 is None:
        return w0, w1
    return jnp.where(b0 > 0, w1, w0)


def _e_step2(e, NS, rc):
    """(emit, pos, sym32, node) of a 16-bit chunked entry (layout per
    pack_quad_tables).  ``sym32`` arrives emit-masked in both layouts.
    Compact: the post-chunk state is stored in the entry, so ``node`` is
    one AND and ``pos`` (= emit & post==0) costs only where consumed
    (XLA/Mosaic DCE drops it in the hot light-segment paths).  Wide:
    the post state is reconstructed from ``rc`` (the chunk's second-bit
    root child) as before."""
    if NS > 1:
        emit = (e >> 15) & 1
        pos = e & 1
        sym32 = emit * ((e >> 1) & 0xFF)
        node = jnp.where(emit > 0, (1 - pos) * rc, e & 0x7FFF)
        return emit, pos, sym32, node
    emit = (e >> 7) & 1
    node = e & 127
    sym32 = e >> 8
    pos = jnp.where(node == 0, emit, 0)
    return emit, pos, sym32, node


# ---------------------------------------------------------------------------
# K1 (1-bit path): fused main scan + candidate discovery


def _k1_kernel(tab_ref, lim_ref, bits_ref, sym_ref, val_ref,
               cntmap_ref, exmap_ref, mrowmap_ref,
               node0, cnt0, done0, exit0, nodeC, cntC, recC, cumMC,
               node_scr, cum_scr, ldr_scr, lcnt_scr,
               *, B, H, steps, SEG, md, CH, HP, RB,
               NS=1, NL=1, bits_whole=False):
    """1-bit K1 with the same two-tier state-equality self-sync as the
    chunked kernel (round 5; see _k1_kernel2's docstring): the main scan
    stores its post-bit NODE per row, candidates resolve on state
    equality (strictly earlier than the superseded emission-coincidence
    test), and NL = min(md, CH) leader chains walk to their own
    resolution publishing node+count per row so follower groups gate off
    fast — deep md=1 trees (one dominant symbol over a byte alphabet)
    get the same bounded adversarial tail as the md >= 2 path."""
    # grid = (row-groups, segments), segments innermost: the kernel walks
    # all segments of RB sublane rows of lanes before moving to the next
    # row group, so the VMEM working set is bounded by RB (not G/128) and
    # the per-row-group scratch resets at s == 0
    R = RB
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        z = jnp.zeros((R, 128), jnp.int32)
        node0[...] = z
        cnt0[...] = z
        done0[...] = z
        exit0[...] = z
        zc = jnp.zeros((CH, R, 128), jnp.int32)
        nodeC[...] = zc
        cntC[...] = zc
        recC[...] = zc
        cumMC[...] = zc

    lim = lim_ref[...]
    # Chain layout (cf. _k1_kernel2): leaders (start rows 1..NL, one per
    # bit-phase residue class mod md) at scratch slots 0..NL-1, then
    # follower groups (same-residue chains, sub-split to <= GROUP_W) —
    # scratch index ci holds the chain starting at row SROWS[ci];
    # candidate-map slot = start row (= the entry offset represented).
    mdg = max(md, 1)
    SROWS = list(range(1, NL + 1))
    GROUPS = []  # follower groups: (scratch base, first start row, count)
    for p_ in range(mdg):
        rows = [r for r in range(NL + 1, CH + 1) if (r - 1) % mdg == p_]
        for j in range(0, len(rows), GROUP_W):
            sub = rows[j:j + GROUP_W]
            if sub:
                GROUPS.append((len(SROWS), sub[0], len(sub)))
                SROWS.extend(sub)
    # candidate liveness for THIS segment, computed up front: recC holds
    # resolution through segment s-1, so the main pass can skip the
    # node_scr/cum_scr stores (only the candidate passes read them) in
    # the post-tail segments where every chain is already resolved
    lim_ok = (lim > s * SEG).astype(jnp.int32)
    glive = []
    live_any = jnp.int32(0)
    for ci in range(NL):
        live_any = jnp.maximum(
            live_any, jnp.max((1 - (recC[ci] & 1)) * lim_ok))
    for (base, r0, n) in GROUPS:
        lg = jnp.int32(0)
        for ci in range(base, base + n):
            lg = jnp.maximum(lg, jnp.max((1 - (recC[ci] & 1)) * lim_ok))
        glive.append(lg)
        live_any = jnp.maximum(live_any, lg)

    UNROLL = 8 if md == 1 else 4 * md  # one/two packed cells per body

    # ---- main 0-chain pass over this segment ------------------------------
    # bits arrive as raw 32-bit payload words; the in-word shift is a
    # SCALAR (same for all lanes), so extraction is a scalar-operand
    # vector shift + mask — Mosaic constant-folds row/shift once the
    # fori unrolls
    def main_block(track_exit, store_scr):
        n_cells = UNROLL // md // CELL

        def body(i, carry):
            node, cnt, done, ex0 = carry
            for tc in range(n_cells):
                cacc = jnp.zeros((R, 128), jnp.int32)
                nacc = jnp.zeros((R, 128), jnp.int32)
                for cs in range(CELL):
                    for u in range(md):
                        lj = i * UNROLL + (tc * CELL + cs) * md + u
                        j = s * SEG + lj
                        boff = j if bits_whole else lj
                        wrow = bits_ref[boff // 32]
                        b = (wrow >> (boff % 32)) & 1
                        w = _pair_word(tab_ref, NS, R, node)
                        e = (w >> (b << 4)) & 0xFFFF
                        e = jnp.where(lim > j, e, 0)
                        emit1, sym32, node = _e1_fields(e, NS)
                        if track_exit:
                            emit1 = emit1 * (1 - done)
                            sym32 = jnp.where(emit1 > 0, sym32, 0)
                            exiting = emit1 * jnp.where(j + 1 >= B, 1, 0)
                            ex0 = jnp.where(exiting > 0, j + 1 - B, ex0)
                            done = done | exiting
                        cnt = cnt + emit1
                        if store_scr:
                            # candidates merge on STATE EQUALITY with the
                            # 0-chain (node_scr); -1 marks rows past the
                            # 0-chain's exit so post-exit coincidences
                            # resolve via `late` instead
                            if track_exit:
                                node_scr[lj] = jnp.where(done > 0, -1, node)
                            else:
                                node_scr[lj] = node
                            cum_scr[lj] = cnt
                        # non-emitting entries carry sym == 0, so the cell
                        # word accumulates by OR; byte cs of the cell is
                        # slot tc*CELL+cs (sym >= 128 at cs == 3 wraps
                        # into the sign bit — K4 masks after the shift)
                        cacc = cacc | (sym32 << (8 * cs))
                        nacc = nacc | (emit1 << cs)
                cl = (i * UNROLL // md) // CELL + tc
                sym_ref[cl] = cacc
                val_ref[cl] = nacc.astype(jnp.uint8)
            return node, cnt, done, ex0

        out = jax.lax.fori_loop(
            0, SEG // UNROLL, body,
            (node0[...], cnt0[...], done0[...], exit0[...]))
        node0[...], cnt0[...], done0[...], exit0[...] = out

    # exit boundary row B-1 can only lie in the trailing segments
    tail = (s + 1) * SEG > B - 1
    live = live_any > 0

    @pl.when(tail & live)
    def _full_s():
        main_block(True, True)

    @pl.when(tail & ~live)
    def _full_n():
        main_block(True, False)

    @pl.when(~tail & live)
    def _light_s():
        main_block(False, True)

    @pl.when(~tail & ~live)
    def _light_n():
        main_block(False, False)

    def bit_step(node, rec, srow, lj, NCH):
        """Shared 1-bit walk step for a candidate batch (NCH, R, 128):
        the gather runs 2D as (NCH*R, 128) (the Mosaic dynamic_gather
        shape), every other op runs 3D with the per-bit operands kept
        (1, R, 128) so the compiler broadcasts vregs instead of
        materializing NCH copies.  Returns
        (emit, nst, valid, started, alive, j)."""
        j = s * SEG + lj
        boff = j if bits_whole else lj
        wrow = bits_ref[boff // 32]
        b = ((wrow >> (boff % 32)) & 1)[None]
        valid = (lim > j)[None]
        w = _pair_word(tab_ref, NS, NCH * R,
                       node.reshape(NCH * R, 128)).reshape(NCH, R, 128)
        e = (w >> (b << 4)) & 0xFFFF
        e = jnp.where(valid, e, 0)
        emit1, _sym, nst = _e1_fields(e, NS)
        alive = 1 - (rec & 1)
        started = jnp.where(j >= srow, 1, 0)
        return emit1, nst, valid, started, alive, j

    # ---- leader pass: NL chains, one per residue, walk to their OWN
    # resolution but keep counting raw (followers compose through them) --
    def _leaders():
        srow = jax.lax.broadcasted_iota(jnp.int32, (NL, R, 128), 0) + 1

        def body(i, carry):
            node, cnt, rec, cum = carry
            emit1, nst, valid, started, alive, j = bit_step(
                node, rec, srow, i, NL)
            # leaders walk and count PAST their resolution (started-gated
            # only): follower deltas need the raw trajectory count
            node = jnp.where(started > 0, nst, node)
            em = emit1 * started
            cnt = cnt + em
            nz = node_scr[i][None]
            # publish the trajectory for followers; publish -1 when
            # (a) this leader late-resolved (exited — its continued walk
            # is spurious), or (b) the MAIN chain has exited (nz == -1):
            # an m0-merged leader keeps tracking the main's PHYSICAL walk
            # into the halo, where post-exit emissions inflate lcnt — a
            # follower state-matching it there would compose a count one
            # short per spurious emission and inherit the 0-chain's exit
            # instead of its own (round-5 md=1 one-byte-mismatch bug)
            lstop = (rec & 1) * (1 - ((rec >> 1) & 1))
            ldr_scr[i] = jnp.where((lstop > 0) | (nz == -1), -1, node)
            lcnt_scr[i] = cnt
            cum0 = cum_scr[i][None]
            m0 = ((alive * started) > 0) & valid & (node == nz)
            late = ((em * alive) > 0) & (j + 1 >= B)
            # stream-end resolution on the final partial lane (see the
            # chunked leader pass): without it an un-merged chain stays
            # "unresolved" and keeps the candidate region live to the
            # program's end
            ended = ((alive * started) > 0) & ~valid
            rec_m = (j << 3) | 2 | 1
            rec_l = (j << 3) | 1
            rec_e = ((B - 1) << 3) | 1
            rec = jnp.where(m0, rec_m, jnp.where(
                late, rec_l, jnp.where(ended, rec_e, rec)))
            cum = jnp.where(m0, jnp.broadcast_to(cum0, cum.shape) - cnt,
                            jnp.where(late | ended, cnt, cum))
            return node, cnt, rec, cum

        init = (nodeC[0:NL], cntC[0:NL], recC[0:NL], cumMC[0:NL])
        node, cnt, rec, cum = jax.lax.fori_loop(0, SEG, body, init,
                                                unroll=SEG)
        nodeC[0:NL] = node
        cntC[0:NL] = cnt
        recC[0:NL] = rec
        cumMC[0:NL] = cum

    if NL:
        pl.when(live_any > 0)(_leaders)

    # ---- follower pass (one gated region per chain group) -----------------
    for gi, (base, r0g, CHg) in enumerate(GROUPS):
        c0g, c1g = base, base + CHg
        lp = (r0g - 1) % mdg  # this group's residue leader slot

        @pl.when(glive[gi] > 0)
        def _cands(c0g=c0g, c1g=c1g, CHg=CHg, r0g=r0g, lp=lp):
            # start row of scratch chain ci = r0g + mdg*(ci - base)
            srow = jax.lax.broadcasted_iota(
                jnp.int32, (CHg, R, 128), 0) * mdg + r0g

            def body(i, carry):
                node, cnt, rec, cum = carry
                emit1, nst, valid, started, alive, j = bit_step(
                    node, rec, srow, i, CHg)
                node = jnp.where(alive * started > 0, nst, node)
                em = emit1 * alive * started
                cnt = cnt + em
                nz = node_scr[i][None]
                nl = ldr_scr[i, lp][None]
                cum0 = cum_scr[i][None]
                lcnt = lcnt_scr[i, lp][None]
                ok = ((alive * started) > 0) & valid
                m0 = ok & (node == nz)
                mL = ok & (node == nl) & ~m0
                late = (em > 0) & (j + 1 >= B)
                ended = ((alive * started) > 0) & ~valid
                rec_m0 = (j << 3) | 2 | 1
                rec_mL = (j << 3) | 4 | 1
                rec_l = (j << 3) | 1
                rec_e = ((B - 1) << 3) | 1
                rec = jnp.where(m0, rec_m0, jnp.where(
                    mL, rec_mL, jnp.where(late, rec_l, jnp.where(
                        ended, rec_e, rec))))
                cum = jnp.where(
                    m0, jnp.broadcast_to(cum0, cum.shape) - cnt,
                    jnp.where(mL, jnp.broadcast_to(lcnt, cum.shape) - cnt,
                              jnp.where(late | ended, cnt, cum)))
                return node, cnt, rec, cum

            init = (nodeC[c0g:c1g], cntC[c0g:c1g],
                    recC[c0g:c1g], cumMC[c0g:c1g])
            node, cnt, rec, cum = jax.lax.fori_loop(0, SEG, body, init,
                                                    unroll=SEG)
            nodeC[c0g:c1g] = node
            cntC[c0g:c1g] = cnt
            recC[c0g:c1g] = rec
            cumMC[c0g:c1g] = cum

    # ---- epilogue: leaders first, then followers compose through them -----
    @pl.when(s == pl.num_programs(1) - 1)
    def _epilogue():
        cnt0t = cnt0[...]
        sent = jnp.full((R, 128), steps, jnp.int32)
        cntmap_ref[0] = cnt0t
        exmap_ref[0] = exit0[...]
        mrowmap_ref[0] = jnp.full((R, 128), -1, jnp.int32)
        Ltot, Lex, Lmrow = [], [], []
        for ci in range(NL):
            rec = recC[ci]
            res = rec & 1
            mrg = (rec >> 1) & 1  # kind 1 = merged with the 0-chain
            mrow = rec >> 3
            # merged: 0-chain total minus the stored delta; late: total
            # stored at the exit emission (the raw count keeps growing
            # into the halo); unresolved: the raw count (stream ended)
            tot = jnp.where(mrg > 0, cnt0t - cumMC[ci], cumMC[ci])
            tot = jnp.where(res > 0, tot, cntC[ci])
            ex = jnp.where(mrg > 0, exit0[...], mrow + 1 - B)
            ex = jnp.where(res > 0, ex, 0)
            mro = jnp.where((res > 0) & (mrg > 0), mrow, sent)
            cntmap_ref[ci + 1] = tot
            exmap_ref[ci + 1] = ex
            mrowmap_ref[ci + 1] = mro
            Ltot.append(tot)
            Lex.append(ex)
            Lmrow.append(mro)
        for ci in range(NL, len(SROWS)):
            row = SROWS[ci]
            lp = (row - 1) % mdg
            rec = recC[ci]
            res = rec & 1
            kind = (rec >> 1) & 3  # 0 late, 1 merged-0, 2 merged-leader
            mrow = rec >> 3
            tot = jnp.where(kind == 1, cnt0t - cumMC[ci], cumMC[ci])
            tot = jnp.where(kind == 2, Ltot[lp] - cumMC[ci], tot)
            tot = jnp.where(res > 0, tot, cntC[ci])
            ex = jnp.where(kind == 1, exit0[...], mrow + 1 - B)
            ex = jnp.where(kind == 2, Lex[lp], ex)
            ex = jnp.where(res > 0, ex, 0)
            mro = jnp.where(kind == 1, mrow, sent)
            mro = jnp.where(kind == 2, jnp.maximum(mrow, Lmrow[lp]), mro)
            mro = jnp.where(res > 0, mro, sent)
            cntmap_ref[row] = tot
            exmap_ref[row] = ex
            mrowmap_ref[row] = mro
        for o in range(CH + 1, HP):
            cntmap_ref[o] = jnp.zeros((R, 128), jnp.int32)
            exmap_ref[o] = jnp.zeros((R, 128), jnp.int32)
            mrowmap_ref[o] = jnp.full((R, 128), steps, jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "B", "H", "G", "steps", "steps_p", "SEG", "UNROLL", "md", "RB",
    "interpret"))
def k1_scan(wmat, tabw, lim2, *, B, H, G, steps, steps_p, SEG, UNROLL, md,
            RB=0, interpret=False):
    """1-bit K1 over the halo'd word matrix ``wmat`` (steps_p//32, R, 128)
    int32 (see words_matrix_device)."""
    UNROLL0 = UNROLL
    del UNROLL
    R = G // 128
    RB = min(RB or R, R)
    RG = R // RB
    S = steps_p // SEG
    CH = max(H - 1, 1)
    HP = -(-(CH + 1) // 8) * 8
    if (UNROLL0 // md) % CELL or (SEG // md) % CELL:
        raise ValueError("UNROLL/md must cover whole cells (see _plan)")
    cells_seg = SEG // md // CELL
    cells_p = steps_p // md // CELL
    NS = tabw.shape[0]  # static under jit; > 1 selects the wide layout
    # word-aligned segments stream per-segment bits blocks through the
    # grid pipeline; odd-md segments (SEG not a word multiple — small
    # corpora only) keep the whole matrix VMEM-resident per row group
    bits_whole = SEG % 32 != 0
    bspec = (pl.BlockSpec((wmat.shape[0], RB, 128),
                          lambda rg, s: (0, rg, 0),
                          memory_space=pltpu.VMEM)
             if bits_whole else
             pl.BlockSpec((SEG // 32, RB, 128), lambda rg, s: (s, rg, 0),
                          memory_space=pltpu.VMEM))
    NL = min(max(md, 1), CH)
    kern = functools.partial(
        _k1_kernel, B=B, H=H, steps=steps, SEG=SEG,
        md=md, CH=CH, HP=HP, RB=RB, NS=NS, NL=NL, bits_whole=bits_whole)
    return pl.pallas_call(
        kern,
        grid=(RG, S),
        in_specs=[
            pl.BlockSpec((NS, 128), lambda rg, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 128), lambda rg, s: (rg, 0),
                         memory_space=pltpu.VMEM),
            bspec,
        ],
        out_specs=[
            pl.BlockSpec((cells_seg, RB, 128), lambda rg, s: (s, rg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cells_seg, RB, 128), lambda rg, s: (s, rg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, RB, 128), lambda rg, s: (0, rg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, RB, 128), lambda rg, s: (0, rg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, RB, 128), lambda rg, s: (0, rg, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cells_p, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((cells_p, R, 128), jnp.uint8),
            jax.ShapeDtypeStruct((HP, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((HP, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((HP, R, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((RB, 128), jnp.int32),          # node0
            pltpu.VMEM((RB, 128), jnp.int32),          # cnt0
            pltpu.VMEM((RB, 128), jnp.int32),          # done0
            pltpu.VMEM((RB, 128), jnp.int32),          # exit0
            pltpu.VMEM((CH, RB, 128), jnp.int32),      # nodeC
            pltpu.VMEM((CH, RB, 128), jnp.int32),      # cntC
            pltpu.VMEM((CH, RB, 128), jnp.int32),      # recC
            pltpu.VMEM((CH, RB, 128), jnp.int32),      # cumMC
            pltpu.VMEM((SEG, RB, 128), jnp.int32),     # node_scr
            pltpu.VMEM((SEG, RB, 128), jnp.int32),     # cum_scr
            pltpu.VMEM((SEG, max(NL, 1), RB, 128), jnp.int32),  # ldr
            pltpu.VMEM((SEG, max(NL, 1), RB, 128), jnp.int32),  # lcnt
        ],
        interpret=interpret,
    )(tabw, lim2, wmat)


# ---------------------------------------------------------------------------
# K1 (2-bit chunked path; k-bit chunking role: jumptableapproach.c:173-258 —
# the reference folds k bits per DFA step; here k=2 halves the per-bit
# bookkeeping of every scan while the gather rate stays 1/bit).
#
# Requires md >= 2 (min code length): then a 2-bit chunk holds at most
# one emission and a root restart never re-emits within the chunk, so a
# 16-bit composite entry suffices (see pack_quad_tables), packed as two
# per-state int32 words T_b0 = e(b1=0) | e(b1=1)<<16.


def _k1_kernel2_c01(tab_ref, lim_ref, bits_ref, c01_ref, *rest, **kw):
    """Entry point with a per-lane root-children word input (batched
    multi-stream decode: each lane's tree has its own C0/C1)."""
    return _k1_kernel2(tab_ref, lim_ref, bits_ref, *rest,
                       c01_ref=c01_ref, **kw)


def _k1_kernel2(tab_ref, lim_ref, bits_ref, sym_ref, val_ref,
                cntmap_ref, exmap_ref, mrowmap_ref,
                node0, cnt0, done0, exit0, nodeC, cntC, recC, cumMC,
                node_scr, cum_scr, ldr_scr, lcnt_scr,
                *, B, H, steps, SEG, md, CH, HP,
                RB, C0, C1, NS, NL, discover=True, bits_whole=False,
                c01_ref=None):
    """Chunked twin of _k1_kernel with two-tier state-equality self-sync
    (round 4).

    Candidates resolve by STATE EQUALITY, not emission coincidence: the
    main scan stores its post-chunk node per row (node_scr), and a chain
    whose state equals the 0-chain's at the same row has an identical
    future (DFA determinism), so it resolves immediately — strictly
    earlier than waiting for a coincident emission.

    Phase-locked runs still defer 0-chain merges for whole bit-phase
    residue classes, so the first chain of each residue class mod md is
    a LEADER (scratch slots 0..NL-1): leaders walk to their own
    resolution, storing node+count per row (ldr_scr/lcnt_scr), while the
    remaining chains (followers) also state-merge against their residue
    leader — inside a phase-locked run same-residue chains coincide
    almost immediately, so follower groups gate off fast and the long
    tail walks NL=md chains instead of H-1 (the round-3 candidate-tail
    problem; this supersedes the windowed exit-map composition idea).
    Follower records compose through the leader in the epilogue:
    total = leader_total - (leader_cnt(m) - cnt(m))."""
    R = RB
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        z = jnp.zeros((R, 128), jnp.int32)
        node0[...] = z
        cnt0[...] = z
        done0[...] = z
        exit0[...] = z
        zc = jnp.zeros((CH, R, 128), jnp.int32)
        nodeC[...] = zc
        cntC[...] = zc
        recC[...] = zc
        cumMC[...] = zc

    lim = lim_ref[...]
    # Chain layout: leaders (start rows 1..NL, one per bit-phase residue
    # class mod md) at scratch slots 0..NL-1, then follower groups
    # (same-residue chains, sub-split to <= 6) — scratch index ci holds
    # the chain starting at row SROWS[ci]; candidate-map slot = start
    # row (= the entry offset the chain represents).
    mdg = max(md, 1)
    SROWS = list(range(1, NL + 1)) if discover else []
    GROUPS = []  # follower groups: (scratch base, first start row, count)
    if discover:  # indexed lanes all start at codeword boundaries:
        for p in range(mdg):  # no candidate chains at all
            rows = [r for r in range(NL + 1, CH + 1) if (r - 1) % mdg == p]
            for j in range(0, len(rows), GROUP_W):
                sub = rows[j:j + GROUP_W]
                if sub:
                    GROUPS.append((len(SROWS), sub[0], len(sub)))
                    SROWS.extend(sub)
    lim_ok = (lim > s * SEG).astype(jnp.int32)
    glive = []
    live_any = jnp.int32(0)
    for ci in range(NL):
        live_any = jnp.maximum(
            live_any, jnp.max((1 - (recC[ci] & 1)) * lim_ok))
    for (base, r0, n) in GROUPS:
        lg = jnp.int32(0)
        for ci in range(base, base + n):
            lg = jnp.maximum(lg, jnp.max((1 - (recC[ci] & 1)) * lim_ok))
        glive.append(lg)
        live_any = jnp.maximum(live_any, lg)

    UNROLL = 4 * md  # one packed cell per body

    # ---- main 0-chain pass ------------------------------------------------
    # bits arrive as raw 32-bit payload words; the in-word shift is a
    # SCALAR (same for all lanes), so chunk extraction is two
    # scalar-operand vector shifts + masks — Mosaic constant-folds the
    # row index / shift once the fori unrolls
    def main_block(track_exit, store_scr):
        n_cells = UNROLL // md // CELL  # == 1

        def body(i, carry):
            node, cnt, done, ex0 = carry
            caccs = [jnp.zeros((R, 128), jnp.int32) for _ in range(n_cells)]
            naccs = [jnp.zeros((R, 128), jnp.int32) for _ in range(n_cells)]
            for cu in range(UNROLL // 2):
                lj2 = i * (UNROLL // 2) + cu
                jbit = s * SEG + 2 * lj2  # absolute bit of chunk start
                boff = jbit if bits_whole else 2 * lj2
                wrow = bits_ref[boff // 32]
                sh = boff % 32
                b0 = (wrow >> sh) & 1
                b1 = (wrow >> (sh + 1)) & 1
                w = _quad_word(tab_ref, NS, R, node, b0)
                e = (w >> (b1 << 4)) & 0xFFFF
                e = jnp.where(lim > jbit, e, 0)
                rc = jnp.where(b1 > 0, C1, C0) if NS > 1 else None
                emit, pos, sym32, node = _e_step2(e, NS, rc)
                if track_exit:
                    emit = emit * (1 - done)
                    sym32 = jnp.where(emit > 0, sym32, 0)
                    exiting = emit * jnp.where(jbit + pos + 1 >= B, 1, 0)
                    ex0 = jnp.where(exiting > 0, jbit + pos + 1 - B, ex0)
                    done = done | exiting
                cnt = cnt + emit
                if store_scr:
                    # candidates merge on STATE EQUALITY with the 0-chain
                    # (node_scr); -1 marks rows past the 0-chain's exit
                    # so post-exit coincidences resolve via `late` instead
                    if track_exit:
                        node_scr[lj2] = jnp.where(done > 0, -1, node)
                    else:
                        node_scr[lj2] = node
                    cum_scr[lj2] = cnt
                # slot attribution: both chunk bits land in the same
                # md-slot iff md is even; odd md splits by pos
                # (i*UNROLL is a multiple of md, so only the in-body
                # offset matters and the indices are static); slot sl
                # packs into byte sl%CELL of cell sl//CELL
                sl0 = (2 * cu) // md
                sl1 = (2 * cu + 1) // md

                def acc(sl, sym_v, em_v):
                    sh8 = 8 * (sl % CELL)
                    ci = sl // CELL
                    sv = sym_v << sh8 if sh8 else sym_v
                    nv = em_v << (sl % CELL) if sl % CELL else em_v
                    caccs[ci] = caccs[ci] | sv
                    naccs[ci] = naccs[ci] | nv

                if sl0 == sl1:
                    acc(sl0, sym32, emit)
                else:
                    m0 = emit * (1 - pos)
                    m1 = emit * pos
                    acc(sl0, jnp.where(m0 > 0, sym32, 0), m0)
                    acc(sl1, jnp.where(m1 > 0, sym32, 0), m1)
            for t in range(n_cells):
                sym_ref[i * n_cells + t] = caccs[t]
                val_ref[i * n_cells + t] = naccs[t].astype(jnp.uint8)
            return node, cnt, done, ex0

        out = jax.lax.fori_loop(
            0, SEG // UNROLL, body,
            (node0[...], cnt0[...], done0[...], exit0[...]))
        node0[...], cnt0[...], done0[...], exit0[...] = out

    tail = (s + 1) * SEG > B - 1
    live = live_any > 0
    # a segment where every lane of this row group is already past its
    # stream end (batch padding lanes / the common-B tail of a shorter
    # stream in a batched decode) writes zero cells and skips the scans
    # entirely — identical output to the fully-masked main pass
    seg_live = jnp.max(lim) > s * SEG

    @pl.when(tail & live & seg_live)
    def _full_s():
        main_block(True, True)

    @pl.when(tail & ~live & seg_live)
    def _full_n():
        main_block(True, False)

    @pl.when(~tail & live & seg_live)
    def _light_s():
        main_block(False, True)

    @pl.when(~tail & ~live & seg_live)
    def _light_n():
        main_block(False, False)

    @pl.when(~seg_live)
    def _dead():
        zc = jnp.zeros((R, 128), jnp.int32)
        for cl in range(SEG // md // CELL):
            sym_ref[cl] = zc
            val_ref[cl] = zc.astype(jnp.uint8)

    def chunk_step(node, rec, srow, lj2, NCH):
        """Shared walk step for a candidate batch (NCH, R, 128): returns
        (node', em, pos, cum0, nz, valid, started, alive, jbit)."""
        jbit = s * SEG + 2 * lj2
        boff = jbit if bits_whole else 2 * lj2
        wrow = bits_ref[boff // 32]
        sh = boff % 32
        b0 = ((wrow >> sh) & 1)[None]
        b1 = ((wrow >> (sh + 1)) & 1)[None]
        valid = (lim > jbit)[None]
        n2 = node.reshape(NCH * R, 128)
        w0, w1 = _quad_word(tab_ref, NS, NCH * R, n2)
        w = jnp.where(b0 > 0, w1.reshape(NCH, R, 128),
                      w0.reshape(NCH, R, 128))
        e = (w >> (b1 << 4)) & 0xFFFF
        e = jnp.where(valid, e, 0)
        if c01_ref is not None:  # per-lane root children (batched trees)
            c01 = c01_ref[...]
            rc = jnp.where(b1 > 0, (c01 >> 16) & 0xFFFF, c01 & 0xFFFF)
        else:
            rc = jnp.where(b1 > 0, C1, C0)
        emit, pos, _sym, nst = _e_step2(e, NS, rc)
        alive = 1 - (rec & 1)
        started = jnp.where(jbit >= srow, 1, 0)
        partial = jnp.where(srow == jbit + 1, 1, 0)
        return (emit, pos, nst, rc, partial, valid, started, alive, jbit)

    # ---- leader pass: NL chains, one per residue, walk to their OWN
    # resolution but keep counting raw (followers compose through them) --
    def _leaders():
        srow = jax.lax.broadcasted_iota(jnp.int32, (NL, R, 128), 0) + 1

        def body(i, carry):
            node, cnt, rec, cum = carry
            (emit, pos, nst, rc, partial, valid, started, alive,
             jbit) = chunk_step(node, rec, srow, i, NL)
            # leaders walk and count PAST their resolution (started-gated
            # only): follower deltas need the raw trajectory count
            node = jnp.where(started > 0, nst, node)
            node = jnp.where((partial > 0) & valid,
                             jnp.broadcast_to(rc, node.shape), node)
            em = emit * started
            cnt = cnt + em
            nz = node_scr[i][None]
            # publish the trajectory for followers; publish -1 when
            # (a) this leader late-resolved (exited — its continued walk
            # is spurious), or (b) the MAIN chain has exited (nz == -1):
            # an m0-merged leader keeps tracking the main's PHYSICAL
            # walk into the halo, where post-exit emissions inflate
            # lcnt — a follower state-matching it there composes a
            # short count and inherits the wrong exit (round-5 bug,
            # found on the md=1 path; latent here too)
            lstop = (rec & 1) * (1 - ((rec >> 1) & 1))
            ldr_scr[i] = jnp.where((lstop > 0) | (nz == -1), -1, node)
            lcnt_scr[i] = cnt
            cum0 = cum_scr[i][None]
            m0 = ((alive * started) > 0) & valid & (node == nz)
            late = ((em * alive) > 0) & (jbit + pos + 1 >= B)
            # stream-end resolution (round 5): on the stream's final
            # PARTIAL lane a chain can neither state-merge past the
            # 0-chain's exit nor emit a late exit — without this it
            # stays "unresolved" and keeps the whole candidate region
            # live for the rest of the program (measured 0.5+ ms on the
            # batched program; the same straggler rides every
            # single-stream decode).  Encoded as a late resolution at
            # row B-1: tot = the raw count, ex = 0, full-replay mrow —
            # byte-identical to the old unresolved epilogue path.
            ended = ((alive * started) > 0) & ~valid
            rec_m = ((jbit + 1) << 3) | 2 | 1
            rec_l = (((jbit + pos) << 3) | 1)
            rec_e = ((B - 1) << 3) | 1
            rec = jnp.where(m0, rec_m, jnp.where(
                late, rec_l, jnp.where(ended, rec_e, rec)))
            cum = jnp.where(m0, jnp.broadcast_to(cum0, cum.shape) - cnt,
                            jnp.where(late | ended, cnt, cum))
            return node, cnt, rec, cum

        init = (nodeC[0:NL], cntC[0:NL], recC[0:NL], cumMC[0:NL])
        node, cnt, rec, cum = jax.lax.fori_loop(0, SEG // 2, body, init,
                                                unroll=SEG // 2)
        nodeC[0:NL] = node
        cntC[0:NL] = cnt
        recC[0:NL] = rec
        cumMC[0:NL] = cum

    if NL:
        pl.when(live_any > 0)(_leaders)

    # ---- follower pass (one gated region per chain group) -----------------
    for gi, (base, r0g, CHg) in enumerate(GROUPS):
        c0g, c1g = base, base + CHg
        lp = (r0g - 1) % mdg  # this group's residue leader slot

        @pl.when(glive[gi] > 0)
        def _cands(c0g=c0g, c1g=c1g, CHg=CHg, r0g=r0g, lp=lp):
            # start row of scratch chain ci = r0g + mdg*(ci - base)
            srow = jax.lax.broadcasted_iota(
                jnp.int32, (CHg, R, 128), 0) * mdg + r0g

            def body(i, carry):
                node, cnt, rec, cum = carry
                (emit, pos, nst, rc, partial, valid, started, alive,
                 jbit) = chunk_step(node, rec, srow, i, CHg)
                node = jnp.where(alive * started > 0, nst, node)
                node = jnp.where((alive * partial > 0) & valid,
                                 jnp.broadcast_to(rc, node.shape), node)
                em = emit * alive * started
                cnt = cnt + em
                nz = node_scr[i][None]
                nl = ldr_scr[i, lp][None]
                cum0 = cum_scr[i][None]
                lcnt = lcnt_scr[i, lp][None]
                ok = ((alive * started) > 0) & valid
                m0 = ok & (node == nz)
                mL = ok & (node == nl) & ~m0
                late = (em > 0) & (jbit + pos + 1 >= B)
                # stream-end resolution: see the leader pass
                ended = ((alive * started) > 0) & ~valid
                rec_m0 = ((jbit + 1) << 3) | 2 | 1
                rec_mL = ((jbit + 1) << 3) | 4 | 1
                rec_l = ((jbit + pos) << 3) | 1
                rec_e = ((B - 1) << 3) | 1
                rec = jnp.where(m0, rec_m0, jnp.where(
                    mL, rec_mL, jnp.where(late, rec_l, jnp.where(
                        ended, rec_e, rec))))
                cum = jnp.where(
                    m0, jnp.broadcast_to(cum0, cum.shape) - cnt,
                    jnp.where(mL, jnp.broadcast_to(lcnt, cum.shape) - cnt,
                              jnp.where(late | ended, cnt, cum)))
                return node, cnt, rec, cum

            init = (nodeC[c0g:c1g], cntC[c0g:c1g],
                    recC[c0g:c1g], cumMC[c0g:c1g])
            node, cnt, rec, cum = jax.lax.fori_loop(0, SEG // 2, body, init,
                                                    unroll=SEG // 2)
            nodeC[c0g:c1g] = node
            cntC[c0g:c1g] = cnt
            recC[c0g:c1g] = rec
            cumMC[c0g:c1g] = cum

    # ---- epilogue: leaders first, then followers compose through them -----
    @pl.when(s == pl.num_programs(1) - 1)
    def _epilogue():
        cnt0t = cnt0[...]
        sent = jnp.full((R, 128), steps, jnp.int32)
        cntmap_ref[0] = cnt0t
        exmap_ref[0] = exit0[...]
        mrowmap_ref[0] = jnp.full((R, 128), -1, jnp.int32)
        Ltot, Lex, Lmrow = [], [], []
        for ci in range(NL):
            rec = recC[ci]
            res = rec & 1
            mrg = (rec >> 1) & 1  # kind 1 = merged with the 0-chain
            mrow = rec >> 3
            # merged: 0-chain total minus the stored delta; late: total
            # stored at the exit emission (the raw count keeps growing
            # into the halo); unresolved: the raw count (stream ended)
            tot = jnp.where(mrg > 0, cnt0t - cumMC[ci], cumMC[ci])
            tot = jnp.where(res > 0, tot, cntC[ci])
            ex = jnp.where(mrg > 0, exit0[...], mrow + 1 - B)
            ex = jnp.where(res > 0, ex, 0)
            mro = jnp.where((res > 0) & (mrg > 0), mrow, sent)
            cntmap_ref[ci + 1] = tot
            exmap_ref[ci + 1] = ex
            mrowmap_ref[ci + 1] = mro
            Ltot.append(tot)
            Lex.append(ex)
            Lmrow.append(mro)
        for ci in range(NL, len(SROWS)):
            row = SROWS[ci]
            lp = (row - 1) % mdg
            rec = recC[ci]
            res = rec & 1
            kind = (rec >> 1) & 3  # 0 late, 1 merged-0, 2 merged-leader
            mrow = rec >> 3
            tot = jnp.where(kind == 1, cnt0t - cumMC[ci], cumMC[ci])
            tot = jnp.where(kind == 2, Ltot[lp] - cumMC[ci], tot)
            tot = jnp.where(res > 0, tot, cntC[ci])
            ex = jnp.where(kind == 1, exit0[...], mrow + 1 - B)
            ex = jnp.where(kind == 2, Lex[lp], ex)
            ex = jnp.where(res > 0, ex, 0)
            mro = jnp.where(kind == 1, mrow, sent)
            mro = jnp.where(kind == 2, jnp.maximum(mrow, Lmrow[lp]), mro)
            mro = jnp.where(res > 0, mro, sent)
            cntmap_ref[row] = tot
            exmap_ref[row] = ex
            mrowmap_ref[row] = mro
        for o in range(CH + 1, HP):
            cntmap_ref[o] = jnp.zeros((R, 128), jnp.int32)
            exmap_ref[o] = jnp.zeros((R, 128), jnp.int32)
            mrowmap_ref[o] = jnp.full((R, 128), steps, jnp.int32)


def _stream_of(rg, bounds):
    """Piecewise-constant stream index of row group ``rg`` (traced-safe:
    a sum of compares against the static row-group boundaries)."""
    k = 0
    for b in bounds:
        k = k + (rg >= b)
    return k


@functools.partial(jax.jit, static_argnames=(
    "B", "H", "G", "steps", "steps_p", "SEG", "UNROLL", "md", "RB",
    "C0", "C1", "NS", "discover", "tab_bounds", "interpret"))
def k1_scan2(wmat, tabq, lim2, c01=None, *, B, H, G, steps, steps_p, SEG,
             UNROLL, md, C0, C1, NS=1, RB=0, discover=True,
             tab_bounds=None, interpret=False):
    """Chunked K1 over the halo'd word matrix ``wmat`` (steps_p//32, R,
    128) int32 (see words_matrix_device).

    ``c01``/``tab_bounds`` (round 5, batched multi-stream decode): when a
    program decodes N independent streams in one launch, ``tabq`` holds N
    stacked compact quad tables ((2N, 128)), ``tab_bounds`` gives the
    static row-group boundaries between streams (the table BlockSpec
    index map selects each row group's own (2, 128) table block — zero
    extra gather cost vs a single stream), and ``c01`` carries each
    lane's root-children word C0 | C1<<16 for the partial-start paths."""
    UNROLL0 = UNROLL
    del UNROLL
    R = G // 128
    RB = min(RB or R, R)
    RG = R // RB
    S = steps_p // SEG
    CH = max(H - 1, 1)
    HP = -(-(CH + 1) // 8) * 8
    if (UNROLL0 // md) % CELL or (SEG // md) % CELL:
        raise ValueError("UNROLL/md must cover whole cells (see _plan)")
    cells_seg = SEG // md // CELL
    cells_p = steps_p // md // CELL
    bits_whole = SEG % 32 != 0
    bspec = (pl.BlockSpec((wmat.shape[0], RB, 128),
                          lambda rg, s: (0, rg, 0),
                          memory_space=pltpu.VMEM)
             if bits_whole else
             pl.BlockSpec((SEG // 32, RB, 128), lambda rg, s: (s, rg, 0),
                          memory_space=pltpu.VMEM))
    NL = min(max(md, 1), CH) if discover else 0
    if tab_bounds is None:
        tab_spec = pl.BlockSpec((2 * NS, 128), lambda rg, s: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        if NS != 1:
            raise ValueError("batched tables require compact (NS=1) trees")
        # 8-row blocks (two live rows + 6 pad): Mosaic requires sublane
        # block dims divisible by 8; the kernel reads rows 0:1 / 1:2 only
        tab_spec = pl.BlockSpec(
            (8, 128), lambda rg, s: (_stream_of(rg, tab_bounds), 0),
            memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((RB, 128), lambda rg, s: (rg, 0),
                             memory_space=pltpu.VMEM)
    kern = functools.partial(
        _k1_kernel2 if c01 is None else _k1_kernel2_c01,
        B=B, H=H, steps=steps, SEG=SEG,
        md=md, CH=CH, HP=HP, RB=RB, C0=C0, C1=C1, NS=NS, NL=NL,
        discover=discover, bits_whole=bits_whole)
    return pl.pallas_call(
        kern,
        grid=(RG, S),
        in_specs=[
            tab_spec,
            lane_spec,
            bspec,
        ] + ([] if c01 is None else [lane_spec]),
        out_specs=[
            pl.BlockSpec((cells_seg, RB, 128), lambda rg, s: (s, rg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cells_seg, RB, 128), lambda rg, s: (s, rg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, RB, 128), lambda rg, s: (0, rg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, RB, 128), lambda rg, s: (0, rg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, RB, 128), lambda rg, s: (0, rg, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cells_p, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((cells_p, R, 128), jnp.uint8),
            jax.ShapeDtypeStruct((HP, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((HP, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((HP, R, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((RB, 128), jnp.int32),            # node0
            pltpu.VMEM((RB, 128), jnp.int32),            # cnt0
            pltpu.VMEM((RB, 128), jnp.int32),            # done0
            pltpu.VMEM((RB, 128), jnp.int32),            # exit0
            pltpu.VMEM((CH, RB, 128), jnp.int32),        # nodeC
            pltpu.VMEM((CH, RB, 128), jnp.int32),        # cntC
            pltpu.VMEM((CH, RB, 128), jnp.int32),        # recC
            pltpu.VMEM((CH, RB, 128), jnp.int32),        # cumMC
            pltpu.VMEM((SEG // 2, RB, 128), jnp.int32),  # node_scr
            pltpu.VMEM((SEG // 2, RB, 128), jnp.int32),  # cum_scr
            pltpu.VMEM((SEG // 2, max(NL, 1), RB, 128), jnp.int32),  # ldr
            pltpu.VMEM((SEG // 2, max(NL, 1), RB, 128), jnp.int32),  # lcnt
        ],
        interpret=interpret,
    )(*((tabq, lim2, wmat) if c01 is None else (tabq, lim2, wmat, c01)))


# ---------------------------------------------------------------------------
# K2: composition (true entry offset per lane)


def _k2_kernel(ex_ref, start_ref, out_ref, tot_ref, *, Rg, NG):
    """ex_ref: (Rg, NG, 128) exit maps — lane l = g*Rg + r, entry offset
    on the 128-lane axis (padded past H).  start_ref: (1, 1) SMEM scalar,
    the entry offset of the very first lane (0 single-chip; a shard's
    composed entry in the multi-chip path).  out_ref: (Rg, NG, 128) uint8
    with out[r, g, :] = true entry offset of lane g*Rg + r (replicated).
    tot_ref: (1, 128) the whole block's composite exit map (exit offset
    for each possible first-lane entry) — the multi-chip shard map.
    Counts/bases are recovered in XLA from the entry offsets."""
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (NG, 128), 1)
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (NG, 128), 0)

    # pass 1: per-group composite exit map evaluated at every entry
    def p1(r, state):
        return jnp.take_along_axis(ex_ref[r], state, axis=1)

    gstate = jax.lax.fori_loop(0, Rg, p1, iota_l)

    # pass 2: prefix-doubling over groups (maps of [0, g) per group)
    pst = jnp.where(iota_g == 0, iota_l, pltpu.roll(gstate, 1, axis=0))
    d = 1
    while d < NG:
        sh_st = jnp.where(iota_g < d, iota_l, pltpu.roll(pst, d, axis=0))
        pst = jnp.take_along_axis(pst, sh_st, axis=1)
        d <<= 1
    # lane-axis dynamic_gather mis-lowers below 8 sublane rows (v5e), so
    # compose the composite row on the last 8 and keep the final one
    # (NG >= 8 by the _plan/NGl group rule)
    tot8 = jnp.take_along_axis(gstate[NG - 8:NG, :], pst[NG - 8:NG, :],
                               axis=1)
    tot_ref[...] = tot8[7:8, :].astype(jnp.uint8)
    e0 = start_ref[0, 0]
    g_off = jnp.take_along_axis(
        pst, jnp.zeros((NG, 128), jnp.int32) + e0, axis=1)

    # pass 3: within-group per-lane entries
    def p3(r, state):
        out_ref[r] = state.astype(jnp.uint8)
        return jnp.take_along_axis(ex_ref[r], state, axis=1)

    jax.lax.fori_loop(0, Rg, p3, g_off)


@functools.partial(jax.jit, static_argnames=("Rg", "NG", "interpret"))
def k2_compose(ex3, start, *, Rg, NG, interpret=False):
    """Compose exit maps into per-lane entries given the first lane's
    entry ``start`` ((1, 1) int32); also returns the block's full
    composite map (1, 128)."""
    kern = functools.partial(_k2_kernel, Rg=Rg, NG=NG)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Rg, NG, 128), jnp.uint8),
                   jax.ShapeDtypeStruct((1, 128), jnp.uint8)],
        interpret=interpret,
    )(ex3, start)


# ---------------------------------------------------------------------------
# K3: fix scan (re-decode pre-merge rows of lanes with nonzero entry)


def _k3_kernel(tab_ref, ent_ref, cut_ref, cutsl_ref, bits_ref,
               symin_ref, valin_ref, sym_ref, val_ref, nodeF,
               *, G, SEG, md, RB, NS=1, bits_whole=False):
    """Adaptive fix + splice scan: full-length grid, but a segment only
    *re-decodes* while some lane's splice window (cut) extends into it —
    merge rows are usually small, yet phase-locked runs of one short code
    can defer self-sync for hundreds of bits (measured p99.9 ~ 756 rows
    on news), so the window cannot be statically bounded.

    The main scan's sym/val slot rows arrive as aliased inputs; gated
    segments write the *merged* rows (fix below each lane's cut slot,
    original at/above it) and every other segment copies its block
    through, so the outputs are the final spliced slot arrays and no XLA
    pass ever touches the full-size emissions again."""
    # grid = (row-groups, segments), segments innermost (cf. _k1_kernel):
    # the replay gate is per row group, so one late-merging lane only
    # replays its own RB rows instead of all G lanes
    R = RB
    s = pl.program_id(1)
    slots_seg = SEG // md
    cells_seg = slots_seg // CELL

    @pl.when(s == 0)
    def _init():
        nodeF[...] = jnp.zeros((R, 128), jnp.int32)

    ent = ent_ref[...]
    gated = jnp.max(cut_ref[...]) > s * SEG

    UNROLL = 8 if md == 1 else 4 * md

    @pl.when(gated)
    def _run():
        cutsl = cutsl_ref[...]
        n_cells = UNROLL // md // CELL

        def body(i, node):
            for tc in range(n_cells):
                cacc = jnp.zeros((R, 128), jnp.int32)
                nacc = jnp.zeros((R, 128), jnp.int32)
                for cs in range(CELL):
                    for u in range(md):
                        lj = i * UNROLL + (tc * CELL + cs) * md + u
                        j = s * SEG + lj
                        boff = j if bits_whole else lj
                        wrow = bits_ref[boff // 32]
                        b = (wrow >> (boff % 32)) & 1
                        w = _pair_word(tab_ref, NS, R, node)
                        e = (w >> (b << 4)) & 0xFFFF
                        # no stream-limit mask: slots at/above each
                        # lane's cut are splice-masked below, so garbage
                        # decoded past the lane end never reaches the
                        # output
                        e = jnp.where(j >= ent, e, 0)
                        emitf, sym32, node = _e1_fields(e, NS)
                        cacc = cacc | (sym32 << (8 * cs))
                        nacc = nacc | (emitf << cs)
                cl = (i * UNROLL // md) // CELL + tc
                # splice at slot granularity *within* the boundary cell:
                # the first k slots of the cell (those below the lane's
                # cut) take the fix scan's bytes, the rest keep the main
                # scan's
                k = jnp.clip(cutsl - (s * cells_seg + cl) * CELL, 0, CELL)
                vmask = (1 << k) - 1
                smask = jnp.where(k >= CELL, -1,
                                  (1 << (8 * jnp.minimum(k, CELL - 1))) - 1)
                sym_ref[cl] = (cacc & smask) | (symin_ref[cl] & ~smask)
                val_ref[cl] = ((nacc & vmask) | (
                    valin_ref[cl].astype(jnp.int32) & ~vmask)
                ).astype(jnp.uint8)
            return node

        nodeF[...] = jax.lax.fori_loop(0, SEG // UNROLL, body, nodeF[...])

    @pl.when(~gated)
    def _copy():
        for cl in range(slots_seg // CELL):
            sym_ref[cl] = symin_ref[cl]
            val_ref[cl] = valin_ref[cl]


@functools.partial(jax.jit, static_argnames=(
    "G", "steps_p", "SEG", "UNROLL", "md", "RB", "interpret"))
def k3_fix(wmat, tabw, ent2, cut2, cutsl2, sym, val, *, G, steps_p, SEG,
           UNROLL, md, RB=0, interpret=False):
    del UNROLL
    R = G // 128
    RB = min(RB or R, R)
    RG = R // RB
    S = steps_p // SEG
    cells_seg = SEG // md // CELL
    cells_p = steps_p // md // CELL
    NS = tabw.shape[0]  # static under jit; > 1 selects the wide layout
    bits_whole = SEG % 32 != 0
    bspec = (pl.BlockSpec((wmat.shape[0], RB, 128),
                          lambda rg, s: (0, rg, 0),
                          memory_space=pltpu.VMEM)
             if bits_whole else
             pl.BlockSpec((SEG // 32, RB, 128), lambda rg, s: (s, rg, 0),
                          memory_space=pltpu.VMEM))
    kern = functools.partial(_k3_kernel, G=G, SEG=SEG, md=md,
                             RB=RB, NS=NS, bits_whole=bits_whole)
    cell_spec = pl.BlockSpec((cells_seg, RB, 128), lambda rg, s: (s, rg, 0),
                             memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((RB, 128), lambda rg, s: (rg, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(RG, S),
        in_specs=[
            pl.BlockSpec((NS, 128), lambda rg, s: (0, 0),
                         memory_space=pltpu.VMEM),
            lane_spec,
            lane_spec,
            lane_spec,
            bspec,
            cell_spec,
            cell_spec,
        ],
        out_specs=[cell_spec, cell_spec],
        out_shape=[
            jax.ShapeDtypeStruct((cells_p, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((cells_p, R, 128), jnp.uint8),
        ],
        scratch_shapes=[pltpu.VMEM((RB, 128), jnp.int32)],
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(tabw, ent2, cut2, cutsl2, wmat, sym, val)


def _k3_kernel2_c01(tab_ref, ent_ref, cut_ref, cutsl_ref, c01_ref,
                    bits_ref, *rest, **kw):
    """Entry point with a per-lane root-children word (batched trees)."""
    return _k3_kernel2(tab_ref, ent_ref, cut_ref, cutsl_ref, bits_ref,
                       *rest, c01_ref=c01_ref, **kw)


def _k3_kernel2(tab_ref, ent_ref, cut_ref, cutsl_ref, bits_ref,
                symin_ref, valin_ref, sym_ref, val_ref, nodeF,
                *, G, SEG, md, C0, C1, NS, RB, bits_whole=False,
                c01_ref=None):
    """Chunked twin of _k3_kernel (fix + splice; see there).  A lane
    whose entry bit is odd activates mid-chunk: that chunk consumes only
    its second bit, i.e. a root step to C0/C1 with no emission possible
    (md >= 2)."""
    R = RB  # grid = (row-groups, segments); per-row-group replay gate
    s = pl.program_id(1)
    slots_seg = SEG // md
    cells_seg = slots_seg // CELL

    @pl.when(s == 0)
    def _init():
        nodeF[...] = jnp.zeros((R, 128), jnp.int32)

    ent = ent_ref[...]
    gated = jnp.max(cut_ref[...]) > s * SEG

    UNROLL = 4 * md

    @pl.when(gated)
    def _run():
        cutsl = cutsl_ref[...]
        n_cells = UNROLL // md // CELL  # == 1

        def body(i, node):
            caccs = [jnp.zeros((R, 128), jnp.int32) for _ in range(n_cells)]
            naccs = [jnp.zeros((R, 128), jnp.int32) for _ in range(n_cells)]
            for cu in range(UNROLL // 2):
                lj2 = i * (UNROLL // 2) + cu
                jbit = s * SEG + 2 * lj2
                boff = jbit if bits_whole else 2 * lj2
                wrow = bits_ref[boff // 32]
                sh = boff % 32
                b0 = (wrow >> sh) & 1
                b1 = (wrow >> (sh + 1)) & 1
                w = _quad_word(tab_ref, NS, R, node, b0)
                e = (w >> (b1 << 4)) & 0xFFFF
                started = jbit >= ent
                # no stream-limit mask (cf. _k3_kernel): splice-masked
                e = jnp.where(started, e, 0)
                if c01_ref is not None:  # per-lane root children (batch)
                    c01 = c01_ref[...]
                    rc = jnp.where(b1 > 0, (c01 >> 16) & 0xFFFF,
                                   c01 & 0xFFFF)
                else:
                    rc = jnp.where(b1 > 0, C1, C0)
                emit, pos, sym32, node_full = _e_step2(e, NS, rc)
                partial = ent == jbit + 1
                node = jnp.where(started, node_full, node)
                node = jnp.where(partial, rc, node)
                sl0 = (2 * cu) // md
                sl1 = (2 * cu + 1) // md

                def acc(sl, sym_v, em_v):
                    sh8 = 8 * (sl % CELL)
                    ci = sl // CELL
                    sv = sym_v << sh8 if sh8 else sym_v
                    nv = em_v << (sl % CELL) if sl % CELL else em_v
                    caccs[ci] = caccs[ci] | sv
                    naccs[ci] = naccs[ci] | nv

                if sl0 == sl1:
                    acc(sl0, sym32, emit)
                else:
                    m0 = emit * (1 - pos)
                    m1 = emit * pos
                    acc(sl0, jnp.where(m0 > 0, sym32, 0), m0)
                    acc(sl1, jnp.where(m1 > 0, sym32, 0), m1)
            for t in range(n_cells):
                cl = i * n_cells + t
                # masked boundary-cell splice (see _k3_kernel)
                k = jnp.clip(cutsl - (s * cells_seg + cl) * CELL, 0, CELL)
                vmask = (1 << k) - 1
                smask = jnp.where(k >= CELL, -1,
                                  (1 << (8 * jnp.minimum(k, CELL - 1))) - 1)
                sym_ref[cl] = (caccs[t] & smask) | (symin_ref[cl] & ~smask)
                val_ref[cl] = ((naccs[t] & vmask) | (
                    valin_ref[cl].astype(jnp.int32) & ~vmask)
                ).astype(jnp.uint8)
            return node

        nodeF[...] = jax.lax.fori_loop(0, SEG // UNROLL, body, nodeF[...])

    @pl.when(~gated)
    def _copy():
        for cl in range(slots_seg // CELL):
            sym_ref[cl] = symin_ref[cl]
            val_ref[cl] = valin_ref[cl]


@functools.partial(jax.jit, static_argnames=(
    "G", "steps_p", "SEG", "UNROLL", "md", "C0", "C1", "NS", "RB",
    "tab_bounds", "interpret"))
def k3_fix2(wmat, tabq, ent2, cut2, cutsl2, sym, val, c01=None, *, G,
            steps_p, SEG, UNROLL, md, C0, C1, NS=1, RB=0, tab_bounds=None,
            interpret=False):
    del UNROLL
    R = G // 128
    RB = min(RB or R, R)
    RG = R // RB
    S = steps_p // SEG
    cells_seg = SEG // md // CELL
    cells_p = steps_p // md // CELL
    bits_whole = SEG % 32 != 0
    bspec = (pl.BlockSpec((wmat.shape[0], RB, 128),
                          lambda rg, s: (0, rg, 0),
                          memory_space=pltpu.VMEM)
             if bits_whole else
             pl.BlockSpec((SEG // 32, RB, 128), lambda rg, s: (s, rg, 0),
                          memory_space=pltpu.VMEM))
    kern = functools.partial(_k3_kernel2 if c01 is None else _k3_kernel2_c01,
                             G=G, SEG=SEG,
                             md=md, C0=C0, C1=C1, NS=NS, RB=RB,
                             bits_whole=bits_whole)
    cell_spec = pl.BlockSpec((cells_seg, RB, 128), lambda rg, s: (s, rg, 0),
                             memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((RB, 128), lambda rg, s: (rg, 0),
                             memory_space=pltpu.VMEM)
    if tab_bounds is None:
        tab_spec = pl.BlockSpec((2 * NS, 128), lambda rg, s: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        if NS != 1:
            raise ValueError("batched tables require compact (NS=1) trees")
        # 8-row blocks (two live rows + 6 pad): see k1_scan2's tab_spec
        tab_spec = pl.BlockSpec(
            (8, 128), lambda rg, s: (_stream_of(rg, tab_bounds), 0),
            memory_space=pltpu.VMEM)
    nin = 7 if c01 is None else 8
    return pl.pallas_call(
        kern,
        grid=(RG, S),
        in_specs=[
            tab_spec,
            lane_spec,
            lane_spec,
            lane_spec,
        ] + ([] if c01 is None else [lane_spec]) + [
            bspec,
            cell_spec,
            cell_spec,
        ],
        out_specs=[cell_spec, cell_spec],
        out_shape=[
            jax.ShapeDtypeStruct((cells_p, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((cells_p, R, 128), jnp.uint8),
        ],
        scratch_shapes=[pltpu.VMEM((RB, 128), jnp.int32)],
        input_output_aliases={nin - 2: 0, nin - 1: 1},
        interpret=interpret,
    )(*((tabq, ent2, cut2, cutsl2, wmat, sym, val) if c01 is None else
        (tabq, ent2, cut2, cutsl2, c01, wmat, sym, val)))


# ---------------------------------------------------------------------------
# K4: per-lane compaction to dense prefixes


def _k4_kernel(sym_ref, val_ref, out_ref, *, cells_p, cells_pp, ORP, RT,
               probes=7):
    """Per-lane compaction from CELL-packed emissions to dense rows, RT
    128-lane tiles per kernel instance (the Pallas TPU tiling rule wants
    the sublane block dim divisible by 8, so blocks carry 8 of the
    (cells_p, R, 128) layout's middle rows at once).

    sym/val arrive spliced (K3) as int32 cell words / u8 valid nibbles in
    the scan's (cell-row, lane) layout; each r sub-tile transposes lanes
    onto sublanes (Mosaic lowers 2D transposes natively — HW-probed),
    computes per-128-cell-window popcount prefix sums, then resolves each
    output rank directly: per-lane window select on the window prefix
    counts, a 7-step binary search for the cell (width-128 lane-axis
    gathers), and a nibble-partial-popcount byte select inside the cell.
    The CELL packing makes one search step cover 4 slots, so there is no
    separate window-merge stage."""
    CW = cells_pp // 128
    iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    for r in range(RT):
        symT = sym_ref[:, r, :].T            # (128, cells_p) i32
        nibT = val_ref[:, r, :].T            # (128, cells_p) u8
        if cells_pp != cells_p:
            pad = cells_pp - cells_p
            symT = jnp.concatenate(
                [symT, jnp.zeros((128, pad), jnp.int32)], axis=1)
            nibT = jnp.concatenate(
                [nibT, jnp.zeros((128, pad), jnp.uint8)], axis=1)
        # Windows pack 3-wide into 10-bit fields of one int32 (a window's
        # count is <= 4*128 = 512 < 2^10), so ONE prefix-sum pass covers
        # up to 3 windows and ONE gather per search step fetches every
        # window's cum — the window select is then a variable shift on
        # the gathered word instead of per-window gathers + selects.
        syms = []
        cpacks = []   # packed popcounts -> packed inclusive prefix sums
        npacks = []   # nibbles, 4-bit fields, up to 8 windows per word
        for w in range(CW):
            sl = slice(w * 128, (w + 1) * 128)
            nib = nibT[:, sl].astype(jnp.int32)
            c2 = ((nib & 1) + ((nib >> 1) & 1)
                  + ((nib >> 2) & 1) + ((nib >> 3) & 1))
            syms.append(symT[:, sl])
            if w % 3 == 0:
                cpacks.append(c2)
            else:
                cpacks[-1] = cpacks[-1] | (c2 << (10 * (w % 3)))
            if w % 8 == 0:
                npacks.append(nib)
            else:
                npacks[-1] = npacks[-1] | (nib << (4 * (w % 8)))
        for pi in range(len(cpacks)):
            cum = cpacks[pi]
            sh = 1
            while sh < 128:
                cum = cum + jnp.where(iota >= sh,
                                      pltpu.roll(cum, sh, axis=1), 0)
                sh <<= 1
            cpacks[pi] = cum
        wpre = [jnp.zeros((128, 1), jnp.int32)]
        for w in range(CW):
            wc = (cpacks[w // 3][:, 127:128] >> (10 * (w % 3))) & 1023
            wpre.append(wpre[-1] + wc)
        max_cnt = jnp.max(wpre[CW])
        # per-window scalar bounds + a (128, 128) wpre matrix: the
        # out-window loop's window bookkeeping is then CW-INVARIANT —
        # q counts only the <=2-3 windows whose boundary crosses this
        # out-window (the rest fold into a scalar base / are skipped),
        # wsel is ONE lane gather, and the packed-cum/nibble/symbol
        # fetches gate per pack on q's scalar range (round 4; the
        # previous CW-linear select chains made large-B lane plans pay
        # ~2x in K4, blocking the candidate-tail-vs-B tradeoff)
        wmax = [jnp.max(wpre[w]) for w in range(CW)]
        wmin = [jnp.min(wpre[w]) for w in range(CW)]
        wmat = jnp.concatenate(
            wpre[:CW] + [jnp.zeros((128, 128 - CW), jnp.int32)], axis=1)

        for oc in range(ORP // 128):
            # out windows past every lane's count hold only masked-off
            # garbage (materialize trims by counts), so skip them — ORP's
            # 1.25x headroom makes the tail skippable
            @pl.when(max_cnt > oc * 128)
            def _ow(oc=oc):
                i_vec = iota + oc * 128      # 0-based global rank
                if CW <= 4:
                    # few windows: the plain compare chain is cheaper
                    # than any scalar gating (lax.cond costs real issue
                    # time per region — measured round 4)
                    q = jnp.zeros((128, 128), jnp.int32)
                    wsel = jnp.zeros((128, 128), jnp.int32)
                    for w in range(1, CW):
                        ge = i_vec >= jnp.broadcast_to(wpre[w], (128, 128))
                        q = q + ge.astype(jnp.int32)
                        wsel = jnp.where(
                            ge, jnp.broadcast_to(wpre[w], (128, 128)), wsel)
                else:
                    # many windows (large-B lane plans): fold statically
                    # out-of-range boundaries into a scalar base, compare
                    # only the 2-3 crossing ones, and gather wsel
                    q = jnp.zeros((128, 128), jnp.int32)
                    qbase = jnp.int32(0)
                    for w in range(1, CW):
                        lo_all = wmax[w] <= oc * 128
                        hi_none = wmin[w] > oc * 128 + 127
                        qbase = qbase + lo_all.astype(jnp.int32)
                        q = jax.lax.cond(
                            lo_all | hi_none, lambda q: q,
                            lambda q, w=w: q + (i_vec >= jnp.broadcast_to(
                                wpre[w], (128, 128))).astype(jnp.int32), q)
                    q = q + qbase
                    wsel = jnp.take_along_axis(wmat, q, axis=1)
                qp3 = q // 3
                shc = (q - 3 * qp3) * 10
                qp8 = q >> 3
                shn = (q & 7) * 4
                qmin = jnp.min(q)
                qmax = jnp.max(q)

                def selp(packs, qp, idx, d):
                    if len(packs) == 1:  # no gating, no select: 1 gather
                        return jnp.take_along_axis(packs[0], idx, axis=1)
                    # gate each pack's gather on q's scalar range: one
                    # out-window's ranks usually touch 1-2 packs
                    g = jnp.zeros((128, 128), jnp.int32)
                    for pi in range(len(packs)):
                        g = jax.lax.cond(
                            (qmin // d <= pi) & (qmax // d >= pi),
                            lambda g, pi=pi: jnp.where(
                                qp == pi,
                                jnp.take_along_axis(packs[pi], idx,
                                                    axis=1), g),
                            lambda g: g, g)
                    return g

                want = i_vec - wsel + 1      # 1-based in-window rank
                pos = jnp.zeros((128, 128), jnp.int32)
                # cbelow tracks cum[pos-1] (exclusive prefix at the final
                # pos) for free — it is exactly the last rejected probe —
                # saving the post-search cum gather
                cbelow = jnp.zeros((128, 128), jnp.int32)
                t = 1 << (probes - 1)
                while t:
                    npos = pos + t
                    c = (selp(cpacks, qp3, npos - 1, 3) >> shc) & 1023
                    take = c < want
                    pos = jnp.where(take, npos, pos)
                    cbelow = jnp.where(take, c, cbelow)
                    t >>= 1
                nibg = (selp(npacks, qp8, pos, 8) >> shn) & 15
                if CW == 1:
                    cell = jnp.take_along_axis(syms[0], pos, axis=1)
                else:
                    cell = jnp.zeros((128, 128), jnp.int32)
                    for w in range(CW):
                        cell = jax.lax.cond(
                            (qmin <= w) & (qmax >= w),
                            lambda c, w=w: jnp.where(
                                q == w,
                                jnp.take_along_axis(syms[w], pos, axis=1),
                                c),
                            lambda c: c, cell)
                q1 = nibg & 1
                q2 = q1 + ((nibg >> 1) & 1)
                q3 = q2 + ((nibg >> 2) & 1)
                rc = (want - 1) - cbelow         # rank within the cell
                p8 = ((rc >= q1).astype(jnp.int32)
                      + (rc >= q2) + (rc >= q3)) << 3
                out_ref[r * 128:(r + 1) * 128, oc * 128:(oc + 1) * 128] = (
                    (cell >> p8) & 0xFF).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("G", "cells_p", "ORP",
                                             "probes", "interpret"))
def k4_compact(sym, val, *, G, cells_p, ORP, probes=7, interpret=False):
    """sym/val: (cells_p, R, 128) spliced CELL-packed scan outputs.
    Returns denseT (G, ORP) u8 — lane g's first n_g decoded bytes
    (lane g = r*128+c).

    ``probes``: binary-search step count.  7 = log2(128 cells) is the
    exact default; smaller values search only the first 2^probes cells
    of each window and produce WRONG bytes for later ranks — a
    TIMING-ONLY knob for the per-probe cost measurement (scripts/
    hw_k4probes.py; DESIGN.md round-5 denser-cell analysis)."""
    R = G // 128
    RT = 8 if R % 8 == 0 else R
    cells_pp = -(-cells_p // 128) * 128
    kern = functools.partial(_k4_kernel, cells_p=cells_p,
                             cells_pp=cells_pp, ORP=ORP, RT=RT,
                             probes=probes)
    cell_spec = pl.BlockSpec((cells_p, RT, 128), lambda t: (0, t, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(R // RT,),
        in_specs=[cell_spec, cell_spec],
        out_specs=pl.BlockSpec((RT * 128, ORP), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, ORP), jnp.uint8),
        interpret=interpret,
    )(sym, val)


# ---------------------------------------------------------------------------
# Whole-program assembly (single jit)


def _select_h(maps, idx, H):
    """maps (H', G) selected per-lane at idx (G,) — H-way select chain."""
    out = jnp.broadcast_to(maps[0], idx.shape)
    for h in range(1, H):
        out = jnp.where(idx == h, maps[h], out)
    return out


@functools.partial(jax.jit, static_argnames=(
    "B", "H", "G", "steps", "steps_p", "SEG", "UNROLL", "md", "Rg", "NG",
    "ORP", "RB", "C0", "C1", "NS", "chunk2", "interpret"))
def wide_decode_program(w2, tabw, lim2, *, B, H, G, steps, steps_p, SEG,
                        UNROLL, md, Rg, NG, ORP, RB=0, C0=0, C1=0, NS=1,
                        chunk2=False, interpret=False):
    """Full fused decode from lane payload words ``w2`` (G, B//32) int32
    (see payload_lane_words).  Returns (denseT (G, ORP) u8, n (G,) i32,
    total i32, fence i32).  The halo'd word matrix is built on device
    (words_matrix_device) as the program's first op, so the timed unit
    covers staging -> dense bytes.

    ``chunk2``: every scan steps two bits at a time off the word rows
    and tabw is the pack_quad_tables word pair (k-bit chunking,
    jumptableapproach.c:173-258 role).  ``NS``: number of 128-state
    table chunks (trees beyond 127 internal states use the wide entry
    layout; see pack_quad_tables)."""
    R = G // 128
    cells_p = steps_p // md // CELL
    wmat = words_matrix_device(w2, -(-steps_p // 32))
    if chunk2:
        sym, val, cntmap, exmap, mrowmap = k1_scan2(
            wmat, tabw, lim2, B=B, H=H, G=G, steps=steps, steps_p=steps_p,
            SEG=SEG, UNROLL=UNROLL, md=md, C0=C0, C1=C1, NS=NS, RB=RB,
            interpret=interpret)
    else:
        sym, val, cntmap, exmap, mrowmap = k1_scan(
            wmat, tabw, lim2, B=B, H=H, G=G, steps=steps, steps_p=steps_p,
            SEG=SEG, UNROLL=UNROLL, md=md, RB=RB, interpret=interpret)

    HP = cntmap.shape[0]
    # maps -> (Rg, NG, 128) with lane l = g*Rg + r, entries on lanes
    def to_k2(m):
        m2 = m.reshape(HP, G).T.reshape(NG, Rg, HP).transpose(1, 0, 2)
        return jnp.pad(m2, ((0, 0), (0, 0), (0, 128 - HP)))

    ent3, _tot = k2_compose(to_k2(exmap), jnp.zeros((1, 1), jnp.int32),
                            Rg=Rg, NG=NG, interpret=interpret)
    entry = ent3[:, :, 0].T.reshape(G).astype(jnp.int32)  # lane-ordered

    cnt2 = cntmap.reshape(HP, G)
    n = _select_h(cnt2, entry, H)
    total = jnp.sum(n)

    mrow_sel = _select_h(mrowmap.reshape(HP, G), entry, H)
    # cut = first row owned by the 0-chain: 0 for entry-0 lanes, merge
    # row + 1 for merged candidates, past-the-end for unmerged ones
    # (which therefore replay fully in the fix scan); lanes past the
    # stream end decode nothing and need no fix
    cut = jnp.where(entry == 0, 0, mrow_sel + 1)
    cut = jnp.where(lim2.reshape(G) > 0, cut, 0)
    cut_slot = jnp.where(cut > 0, (cut - 1) // md + 1, 0)

    # K3 splices the fix rows into the scan's sym/val in place (aliased
    # outputs); K4 folds the lane transpose and slot padding into the
    # compaction kernel — no XLA pass ever touches the big slot arrays
    if chunk2:
        msym, mval = k3_fix2(wmat, tabw, entry.reshape(R, 128),
                             cut.reshape(R, 128), cut_slot.reshape(R, 128),
                             sym, val, G=G, steps_p=steps_p, SEG=SEG,
                             UNROLL=UNROLL, md=md, C0=C0, C1=C1, NS=NS,
                             RB=RB, interpret=interpret)
    else:
        msym, mval = k3_fix(wmat, tabw, entry.reshape(R, 128),
                            cut.reshape(R, 128), cut_slot.reshape(R, 128),
                            sym, val, G=G, steps_p=steps_p, SEG=SEG,
                            UNROLL=UNROLL, md=md, RB=RB, interpret=interpret)
    denseT = k4_compact(msym, mval, G=G, cells_p=cells_p, ORP=ORP,
                        interpret=interpret)
    # fence: a 1-element value data-dependent on the LAST kernel's output,
    # so a tiny readback provably brackets the whole program (this
    # environment's relay can return from block_until_ready early)
    fence = total + denseT[0, 0].astype(jnp.int32)
    return denseT, n, total, fence


# ---------------------------------------------------------------------------
# Host wrapper


def _plan(bits: int, H: int, md: int, lanes=None, avg_len=None):
    """Static launch geometry for a stream.

    ``avg_len``: mean code length (bits / uncompressed size) — sizes the
    dense output buffer tightly; a lane that overflows it sets the
    wrapper's fallback path, so this is a heuristic, not a bound."""
    # UNROLL/md = 4 slots = exactly one CELL per unrolled body (8 = two
    # cells for md=1), so every kernel body packs whole 4-slot cells; md
    # is capped at 8 structurally (a byte alphabet with all codes > 8
    # bits would need > 256 leaves), so UNROLL <= 32.  The whole word
    # matrix rides in VMEM per row group, so SEG need not align to
    # 32-bit words (in-word shifts are traced scalars).
    UNROLL = 8 if md == 1 else 4 * md
    SEG = UNROLL * max(1, 32 // UNROLL)
    if lanes is None:
        # HW sweep (v5e, 2026-08-17): throughput peaks at ~500 decoded
        # symbols per lane across all corpora — shorter lanes inflate the
        # candidate tail cost (CH chains x G lanes x self-sync delay),
        # longer lanes inflate the per-lane output/compaction windows.
        # Round size/500 to the nearest power of two in log space.
        size = bits / avg_len if avg_len else bits / 4.0
        xi = max(int(size / 500), 1)
        p2 = xi.bit_length() - 1
        if xi * xi > 2 << (2 * p2):  # xi > sqrt(2)*2^p2 -> round up
            p2 += 1
        G = 1 << p2
        # narrow-vector floor (re-swept 2026-08-18 after the compaction
        # rework): small streams were K1-latency-bound at few sublane
        # rows — news/paper1/book2 measured 15-40% faster at 4096 lanes
        # — so prefer >= 4096 lanes while each lane keeps a comfortable
        # bit count (the compaction that once penalized short lanes is
        # now count-gated and cheap).
        # Round-4 re-sweep (after state-equality self-sync + in-kernel
        # word staging): sub-4 Mbit streams now measure fastest at their
        # natural size/500 geometry (news G=1024: 0.340 ms vs 0.373 at
        # the 4096 floor; book2 G=1024/2048: 0.38-0.40 vs 0.447), so the
        # 4096 floor applies only to big streams.
        G = max(4096 if bits >= (1 << 22) else 1024, min(G, 1 << 14))
        while G > 1024 and bits // G < max(2 * SEG, 2 * H):
            G //= 2
        G = max(1024, G)
    else:
        # floor 512: Mosaic's lane-axis dynamic_gather mis-lowers at one
        # sublane row ("Shape mismatch in input, indices and output",
        # v5e); 512 lanes (4 rows) is the smallest HW-validated geometry.
        # Round up to a power of two so the kernels' row-group blocking
        # (RB | R) and K4's 8-row tiling always divide evenly.
        G = max(512, 1 << (max(int(lanes), 1) - 1).bit_length())
    B = -(-bits // G)
    B = -(-B // 32) * 32  # whole payload words per lane
    steps = B + H
    steps_p = -(-steps // SEG) * SEG
    # composition group split: G = NG groups x Rg lanes, both ~sqrt(G)
    NG = 1 << ((G // 128).bit_length() // 2 + 3)
    NG = min(NG, G)
    Rg = G // NG
    hard = min(B // md + 2, steps_p // md)
    if avg_len is not None and avg_len > 0:
        # 1.25x headroom over the mean lane count: per-lane counts
        # concentrate tightly around B/avg, K4 out-window work scales
        # with ORP, and the wrapper falls back to the exact round-1 path
        # if any lane overflows (decode_widescan counts check)
        ORP = min(int(B / avg_len * 1.25) + 66, hard)
    else:
        ORP = hard
    ORP = -(-ORP // 128) * 128
    # K1 row-group blocking: cap the VMEM-resident lane-state slice at 32
    # sublane rows (~4 MB scoped VMEM incl. candidate scratch); G beyond
    # 4096 lanes walks multiple row groups in the outer grid dimension
    RB = min(G // 128, 32)
    return dict(G=G, B=B, steps=steps, steps_p=steps_p, SEG=SEG,
                UNROLL=UNROLL, NG=NG, Rg=Rg, ORP=ORP, RB=RB)


class EnvelopeError(ValueError):
    """The tree/geometry is outside the widescan program's envelope
    (>1023 internal states or a tiny stream); callers fall back to
    another decoder."""


def stage_widescan_inputs(hf, lanes=None):
    """Build everything the fused program needs, once, host-side.

    Returns a dict with the plan, chunk2 eligibility, packed tables
    (device arrays), the per-lane payload words and limits.  The only
    host-side staging is the padded word copy (payload_lane_words); the
    kernels' word matrix is built on device inside the program.  Raises
    EnvelopeError for trees the program cannot handle — the single
    place the eligibility rules live (decode_widescan, bench.py and the
    sharded runner all call this)."""
    from huffmandecoderongpus_tpu.ops.lanedfa import build_lane_dfa

    dfa = build_lane_dfa(hf.tree)
    H = max(dfa.height, 1)
    md = max(dfa.min_depth, 1)
    n_states = dfa.entry.shape[0] // 2
    if n_states > MAX_STATES_WIDE:
        raise EnvelopeError("tree exceeds the wide quad-table state limit")
    if hf.bits < 1024 * max(H, 8):
        raise EnvelopeError("stream too small for the wide-lane program")
    avg = hf.bits / max(hf.uncompressed_size, 1)
    p = _plan(hf.bits, H, md, lanes=lanes, avg_len=avg)
    G = p["G"]
    chunk2 = md >= 2
    C0 = C1 = 0
    NS = 1
    if chunk2:
        tabq, C0, C1, NS = pack_quad_tables(dfa)
        tabw = jnp.asarray(tabq)
    else:
        # md=1 trees of any depth <= MAX_STATES_WIDE stay on the fused
        # path: pack_pair_table switches to the wide entry layout and
        # the 1-bit kernels chunk the table (NS from the table shape)
        tabp = pack_pair_table(dfa)
        NS = tabp.shape[0]
        tabw = jnp.asarray(tabp)
    w2 = payload_lane_words(hf.payload, hf.bits, G, p["B"])
    lane = np.arange(G, dtype=np.int64).reshape(G // 128, 128)
    lim2 = jnp.asarray(
        np.clip(hf.bits - lane * p["B"], -(1 << 30), 1 << 30).astype(np.int32))
    return dict(plan=p, dfa=dfa, H=H, md=md, chunk2=chunk2, C0=C0, C1=C1,
                NS=NS, tabw=tabw, words=jnp.asarray(w2), lim2=lim2)


def decode_widescan(hf, lanes=None, check_size=True, interpret=False,
                    oneshot=None):
    """Wide-lane fused decode of a HuffFile to dense bytes.

    ``oneshot``: None (default) routes sub-ONESHOT_MAX_BITS streams to
    the single-dispatch kernel when VMEM-eligible — but only off the
    interpreter, where the whole-program kernel is pathologically slow;
    True forces the route (tests), False disables it.

    Falls back to the round-1 Pallas path for tiny streams, trees beyond
    the wide quad-table limit (1023 internal states; full byte alphabets
    at 255 states stay on the fast path via chunked tables), or a lane
    overflowing the dense output buffer.

    Streams under ONESHOT_MAX_BITS (~2 Mbit) route to the single-dispatch
    one-shot kernel (ops/pallas_oneshot.py) when it fits VMEM: the round-4
    dispatch-floor measurement showed the small-corpus cost is per-program
    dispatch overhead (~0.11 ms/program on this environment's relay; a
    trivial jitted x+1 costs the same), so one dispatch beats the 4-kernel
    pipeline where device compute is small (paper1 0.119 vs 0.127 ms,
    news 0.272 vs 0.322, same session) and loses above ~3 Mbit where
    grid-level DMA/compute overlap dominates (book2 0.516 vs 0.397)."""
    def _fallback():
        from huffmandecoderongpus_tpu.ops.pallas_lanedfa import (
            decode_lanedfa_pallas,
        )

        return decode_lanedfa_pallas(hf, check_size=check_size,
                                     interpret=interpret)

    try:
        st = stage_widescan_inputs(hf, lanes=lanes)
    except EnvelopeError:
        return _fallback()
    route = (oneshot if oneshot is not None
             else (hf.bits < ONESHOT_MAX_BITS and not interpret))
    if route:
        from huffmandecoderongpus_tpu.ops import pallas_oneshot as _ons

        if _ons.oneshot_eligible(st):
            try:
                return _ons.decode_oneshot_staged(
                    hf, st, check_size=check_size, interpret=interpret)
            except EnvelopeError:
                pass  # lane overflow: fall through to the 4-kernel path
    p = st["plan"]
    G = p["G"]
    H, md = st["H"], st["md"]

    denseT, n, total, _fence = wide_decode_program(
        st["words"], st["tabw"], st["lim2"], B=p["B"], H=H, G=G,
        steps=p["steps"], steps_p=p["steps_p"], SEG=p["SEG"],
        UNROLL=p["UNROLL"], md=md, Rg=p["Rg"], NG=p["NG"], ORP=p["ORP"],
        RB=p["RB"], C0=st["C0"], C1=st["C1"], NS=st["NS"],
        chunk2=st["chunk2"], interpret=interpret)
    if check_size and int(total) != hf.uncompressed_size:
        raise RuntimeError(
            f"decoded {int(total)} symbols, header says "
            f"{hf.uncompressed_size}")
    dense = np.asarray(denseT)
    counts = np.asarray(n)
    if counts.max(initial=0) > p["ORP"]:
        return _fallback()  # a lane overflowed the dense buffer
    mask = np.arange(p["ORP"])[None, :] < counts[:, None]
    out = dense[mask]
    if check_size and out.size != hf.uncompressed_size:
        raise RuntimeError(
            f"emitted {out.size} symbols, header says {hf.uncompressed_size}")
    return out


# ---------------------------------------------------------------------------
# Indexed decode: `.huffidx` sidecar defines the lanes


def indexed_lane_words(payload: np.ndarray, bits: int, offsets: np.ndarray,
                       BW: int):
    """(G-padded) (nb, BW+1) int32 raw word rows for *index-defined*
    lanes: row g holds the payload words from word offsets[g]//32 on;
    the in-word bit shifts offsets[g]%32 come back separately and are
    applied ON DEVICE (normalize_lane_words) — so the host staging is a
    word-level row gather, 16x less work than the round-3 per-chunk
    gather (and 32x less than a per-bit unpack)."""
    nw = (bits + 31) // 32
    fw = np.zeros((nw + BW + 2) * 4, dtype=np.uint8)
    nb_payload = min(int(payload.size), nw * 4)
    fw[:nb_payload] = payload[:nb_payload]
    full, rem = divmod(bits, 8)
    if full < nb_payload:
        if rem:
            fw[full] &= (1 << rem) - 1
            fw[full + 1:nb_payload] = 0
        else:
            fw[full:nb_payload] = 0
    words = fw.view("<u4").view(np.int32)
    base = (offsets >> 5).astype(np.int64)
    raw = words[base[:, None] + np.arange(BW + 1, dtype=np.int64)[None, :]]
    return np.ascontiguousarray(raw), (offsets & 31).astype(np.int32)


def normalize_lane_words(raw: jnp.ndarray, sh: jnp.ndarray) -> jnp.ndarray:
    """Device-side per-lane bit alignment: raw (G, BW+1) word rows and
    in-word shifts sh (G,) -> (G, BW) words whose bit 0 is each lane's
    first stream bit.  One XLA elementwise pass (logical shifts on the
    uint32 bit pattern), replacing the round-3 host-side parity-phased
    chunk gather."""
    u = jax.lax.bitcast_convert_type(raw, jnp.uint32)
    shu = sh.astype(jnp.uint32)[:, None]
    shl = ((32 - sh) & 31).astype(jnp.uint32)[:, None]
    lo = jax.lax.shift_right_logical(u[:, :-1], shu)
    hi = jnp.where(sh[:, None] == 0, jnp.uint32(0),
                   jax.lax.shift_left(u[:, 1:], shl))
    return jax.lax.bitcast_convert_type(lo | hi, jnp.int32)


def stage_widescan_indexed(hf, offsets: np.ndarray, block_symbols: int,
                           lane_multiple: int = 1024):
    """Stage the indexed fused decode: the `.huffidx` block boundaries
    ARE the lane starts, so every lane begins at the DFA root and no
    discovery, composition, or fix scan is needed; per-lane symbol
    counts are exact from the index.  Raises EnvelopeError outside the
    chunked envelope (md=1 trees, too few blocks, >1023 states).

    ``lane_multiple``: pad the lane count to this multiple (>= 1024;
    the sharded runner passes 512 * D so every shard's row count splits
    into HW-validated row-group blocks)."""
    from huffmandecoderongpus_tpu.ops.lanedfa import build_lane_dfa

    dfa = build_lane_dfa(hf.tree)
    H = max(dfa.height, 1)
    md = max(dfa.min_depth, 1)
    n_states = dfa.entry.shape[0] // 2
    if n_states > MAX_STATES_WIDE:
        raise EnvelopeError("tree exceeds the wide quad-table state limit")
    if md < 2:
        raise EnvelopeError("indexed widescan needs min code length >= 2")
    offsets = np.asarray(offsets, dtype=np.int64)
    nb = offsets.shape[0]
    if nb < 128:
        raise EnvelopeError("too few index blocks for the wide program")
    if block_symbols > 1024:
        # long blocks blow K4's VMEM blocking (cells_p x RT x 128 words
        # + the (RT*128, ORP) out block must fit scoped VMEM); ~512
        # symbols per block is also the measured throughput sweet spot
        raise EnvelopeError("index blocks too long for the wide program")
    ends = np.append(offsets[1:], hf.bits)
    lens = ends - offsets
    if np.any(lens < 0) or offsets[0] != 0:
        raise ValueError("corrupt block index: offsets not increasing from 0")
    UNROLL = 4 * md
    SEG = math.lcm(CELL * md, 32)
    B = int(lens.max(initial=1))
    steps_p = -(-B // SEG) * SEG
    BW = -(-steps_p // 32)
    # 1024-lane floor: K4's 8-row tiling (RT=8) and the Mosaic gather
    # row minimums want R a multiple of 8; excess lanes are all-PAD
    lane_multiple = max(int(lane_multiple), 1024)
    G = max(lane_multiple, -(-nb // lane_multiple) * lane_multiple)
    R = G // 128
    # K1's row-group blocking requires RB | R (G is not a power of two
    # here, so 32 need not divide R)
    RB = 32 if R % 32 == 0 else (16 if R % 16 == 0 else 8)
    if SEG > 96:
        RB = min(RB, 16)
    n = np.zeros(G, dtype=np.int32)
    n[:nb] = block_symbols
    n[nb - 1] = hf.uncompressed_size - (nb - 1) * block_symbols
    if n[nb - 1] < 0 or n[:nb].max(initial=0) > block_symbols:
        raise ValueError("block index inconsistent with the header")
    ORP = -(-block_symbols // 128) * 128
    tabq, C0, C1, NS = pack_quad_tables(dfa)
    offs_p = np.zeros(G, dtype=np.int64)
    offs_p[:nb] = offsets
    raw, sh = indexed_lane_words(hf.payload, hf.bits, offs_p, BW)
    lim2 = np.zeros((R, 128), dtype=np.int32)
    lim2.reshape(-1)[:nb] = lens.astype(np.int32)
    return dict(plan=dict(B=steps_p, steps=steps_p, steps_p=steps_p,
                          SEG=SEG, UNROLL=UNROLL, G=G, RB=RB, ORP=ORP),
                H=H, md=md, C0=C0, C1=C1, NS=NS, tabw=jnp.asarray(tabq),
                raw=jnp.asarray(raw), sh=jnp.asarray(sh),
                lim2=jnp.asarray(lim2), counts=n, nb=nb)


@functools.partial(jax.jit, static_argnames=(
    "B", "H", "G", "steps_p", "SEG", "UNROLL", "md", "RB", "ORP",
    "C0", "C1", "NS", "interpret"))
def wide_decode_indexed_program(raw, sh, tabq, lim2, *, B, H, G, steps_p,
                                SEG, UNROLL, md, RB, ORP, C0, C1, NS,
                                interpret=False):
    """Indexed fused decode: device-side word alignment + transpose, K1
    main scan only (``discover=False`` skips the candidate machinery
    entirely), straight into K4 compaction.  Returns (denseT (G, ORP)
    u8, fence)."""
    R = G // 128
    w2 = normalize_lane_words(raw, sh)
    wmat = w2.T.reshape(-(-steps_p // 32), R, 128)
    sym, val, *_ = k1_scan2(
        wmat, tabq, lim2, B=B, H=H, G=G, steps=steps_p, steps_p=steps_p,
        SEG=SEG, UNROLL=UNROLL, md=md, C0=C0, C1=C1, NS=NS, RB=RB,
        discover=False, interpret=interpret)
    cells_p = steps_p // md // CELL
    denseT = k4_compact(sym, val, G=G, cells_p=cells_p, ORP=ORP,
                        interpret=interpret)
    fence = denseT[0, 0].astype(jnp.int32) + denseT[G - 1, 0].astype(
        jnp.int32)
    return denseT, fence


def decode_widescan_indexed(hf, offsets, block_symbols: int,
                            check_size: bool = True,
                            interpret: bool = False) -> np.ndarray:
    """Widescan decode with a `.huffidx` sidecar: index blocks are the
    lanes, so the program is the main scan + dense compaction — no
    discovery, no composition, no fix scan; counts are exact from the
    index.  Raises EnvelopeError for callers to fall back."""
    st = stage_widescan_indexed(hf, offsets, block_symbols)
    p = st["plan"]
    # (no ORP overflow check: staging sizes ORP = ceil(block_symbols/128)
    # *128 >= block_symbols, so indexed lanes cannot overflow)
    denseT, _fence = wide_decode_indexed_program(
        st["raw"], st["sh"], st["tabw"], st["lim2"], B=p["B"], H=st["H"],
        G=p["G"], steps_p=p["steps_p"], SEG=p["SEG"], UNROLL=p["UNROLL"],
        md=st["md"], RB=p["RB"], ORP=p["ORP"], C0=st["C0"], C1=st["C1"],
        NS=st["NS"], interpret=interpret)
    dense = np.asarray(denseT)
    counts = st["counts"]
    mask = np.arange(p["ORP"])[None, :] < counts[:, None]
    out = dense[mask]
    if check_size and out.size != hf.uncompressed_size:
        raise RuntimeError(
            f"emitted {out.size} symbols, header says {hf.uncompressed_size}")
    return out
