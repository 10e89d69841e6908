"""Multi-device lane-DFA decode: the lane axis sharded over the mesh.

The single-device lane decoder (ops/lanedfa.py) already splits the stream
into G halo'd lanes with per-lane exit maps.  Multi-chip is then just a
two-level composition of the same maps:

  1. The (B+H, G) bit matrix is sharded over its lane axis — each device
     holds G/D contiguous lane columns (halo included, so no neighbor
     exchange is ever needed for the scans).
  2. Each shard runs the candidate scan locally and folds its own lanes'
     maps into a shard-level map: for each of the H entry offsets of its
     FIRST lane, (exit offset into the next shard's first lane, symbols).
  3. One `all_gather` moves the D x H x 2 shard maps (a few hundred ints)
     over ICI; every device composes them identically to find its true
     entry offset and global symbol base — the same stitching pattern as
     parallel/block_decode.py, now layered on lanes.
  4. The main scan runs locally from the composed entries; padded
     emissions come back sharded in lane order and the host compacts.

Compare the reference's multi-device story: none (SURVEY §2.3) — its
device-side parallelism stops at one GPU grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from huffmandecoderongpus_tpu.ops.lanedfa import (
    EMIT_BIT,
    STATE_MASK,
    build_lane_dfa,
    bits_matrix,
    pick_lanes,
    small_gather,
)
from huffmandecoderongpus_tpu.parallel.mesh import BLOCK_AXIS, make_mesh

#: shard_map's collective-correctness checker on the Pallas shard bodies.
#: pallas_call inside shard_map currently trips a varying-axis mismatch on
#: the call's internal fori-loop carry block refs (the JAX error text
#: itself recommends ``check_vma=False`` as a temporary workaround), so
#: the two Pallas bodies run unchecked; the XLA body keeps the checker on.
#: The exemption is TRACKED, not permanent: tests/test_parallel.py::
#: test_pallas_shard_body_check_vma_upstream re-runs a Pallas shard body
#: with the checker forced on and xfails until the toolchain lowers it —
#: when that test starts passing, flip this to True and delete it.
CHECK_VMA_PALLAS = False


def _stitch(cnt, ex, d, *, H, Gl, D, axis):
    """Fold local lane maps into a shard map, all_gather the D x H shard
    maps, compose globally, and recover per-lane entries.  Returns
    (entry_off (Gl,), bases (Gl,), total scalar)."""
    def fold(g, carry):
        off, base = carry  # (H,), (H,)
        return ex[off, g], base + cnt[off, g]

    vary = functools.partial(jax.lax.pcast, axis_name=(axis,), to='varying')
    off0 = vary(jnp.arange(H, dtype=jnp.int32))
    shard_ex, shard_cnt = jax.lax.fori_loop(
        0, Gl, fold, (off0, vary(jnp.zeros(H, dtype=jnp.int32))))

    # one tiny collective: (D, H) maps; identical composition everywhere
    all_ex = jax.lax.all_gather(shard_ex, axis)  # (D, H)
    all_cnt = jax.lax.all_gather(shard_cnt, axis)

    def comp(k, carry):
        e, base, my_e, my_base = carry
        is_mine = k == d
        my_e = jnp.where(is_mine, e, my_e)
        my_base = jnp.where(is_mine, base, my_base)
        return all_ex[k, e], base + all_cnt[k, e], my_e, my_base

    z0 = vary(jnp.int32(0))
    _, total, my_e, my_base = jax.lax.fori_loop(0, D, comp, (z0, z0, z0, z0))

    def lane_fold(g, carry):
        off, base, entry_off, bases = carry
        entry_off = entry_off.at[g].set(off)
        bases = bases.at[g].set(base)
        return ex[off, g], base + cnt[off, g], entry_off, bases

    _, _, entry_off, bases = jax.lax.fori_loop(
        0, Gl, lane_fold,
        (my_e, my_base, vary(jnp.zeros(Gl, dtype=jnp.int32)),
         vary(jnp.zeros(Gl, dtype=jnp.int32))))
    return entry_off, bases, total


def _shard_tail_pallas(bits4, tab, cnt, ex, lim4, *, d, B, H, N, Gl, D, axis,
                       T, interpret):
    """Stitch + Pallas main scan for the pallas shard body."""
    from huffmandecoderongpus_tpu.ops import pallas_lanedfa as pld

    entry_off, bases, total = _stitch(cnt, ex, d, H=H, Gl=Gl, D=D, axis=axis)
    sym4, valid4 = pld.lane_scan_pallas_tiled(
        bits4, tab, entry_off.reshape(T, 8, pld.CHUNK), B=B, H=H, N=N, G=Gl,
        lim4=lim4, interpret=interpret, vma=(axis,))
    steps = B + H
    sym = pld._from_tiles(sym4, steps, Gl)
    valid = pld._from_tiles(valid4, steps, Gl).astype(bool)
    n_lane = valid.sum(axis=0).astype(jnp.int32)
    return sym, valid, n_lane, total[None]


def _shard_body(bits_loc, tab, *, B, H, N, Gl, D, axis, pallas=False,
                interpret=False):
    """Per-device program over its Gl local lanes.

    ``pallas=True`` runs the scans as the Mosaic kernels
    (ops/pallas_lanedfa.py) with per-lane stream limits passed as data —
    the shard offset is a traced value, which is exactly why the kernels
    take `lim4` instead of a static N."""
    d = jax.lax.axis_index(axis).astype(jnp.int32)
    lane0 = d * Gl  # first global lane of this shard
    lane_base = (lane0 + jnp.arange(Gl, dtype=jnp.int32)) * B
    offs = jnp.arange(H, dtype=jnp.int32)[:, None]

    if pallas:
        from huffmandecoderongpus_tpu.ops import pallas_lanedfa as pld

        T = Gl // pld.LANE_TILE
        steps = B + H
        bits4 = pld._to_tiles(bits_loc, steps, Gl)
        lim4 = (N - lane_base * 1).reshape(T, 8, pld.CHUNK)
        cnt, ex = pld.candidate_scan_pallas_tiled(
            bits4, tab, B=B, H=H, N=N, G=Gl, lim4=lim4, interpret=interpret,
            vma=(axis,))
        return _shard_tail_pallas(bits4, tab, cnt, ex, lim4, d=d, B=B, H=H,
                                  N=N, Gl=Gl, D=D, axis=axis, T=T,
                                  interpret=interpret)

    # candidate scan over local lanes (same recurrence as ops/lanedfa.py,
    # with absolute stream positions via lane_base)
    def cstep(carry, inp):
        node, cnt, ex, done = carry
        bit, j = inp
        e = small_gather(tab, node * 2 + bit[None, :].astype(jnp.int32))
        live = (j >= offs) & ~done & (lane_base[None, :] + j < N)
        emit = live & ((e & EMIT_BIT) != 0)
        nxt = jnp.where(live, e & STATE_MASK, node)
        cnt = cnt + emit.astype(jnp.int32)
        exiting = emit & (j + 1 >= B)
        ex = jnp.where(exiting, j + 1 - B, ex)
        return (nxt, cnt, ex, done | exiting), None

    js = jnp.arange(B + H, dtype=jnp.int32)
    # carries turn device-varying inside the scan (via lane_base); mark
    # the replicated seeds as varying for the vma checker
    vary = functools.partial(jax.lax.pcast, axis_name=(axis,), to='varying')
    z = vary(jnp.zeros((H, Gl), dtype=jnp.int32))
    (node, cnt, ex, _), _ = jax.lax.scan(
        cstep, (z, z, z, vary(jnp.zeros((H, Gl), dtype=bool))),
        (bits_loc, js))

    entry_off, bases, total = _stitch(cnt, ex, d, H=H, Gl=Gl, D=D, axis=axis)

    # main scan from the true entries
    def mstep(carry, inp):
        nd, done = carry
        bit, j = inp
        e = small_gather(tab, nd * 2 + bit.astype(jnp.int32))
        active = (j >= entry_off) & ~done & (lane_base + j < N)
        emit = active & ((e & EMIT_BIT) != 0)
        nxt = jnp.where(active, e & STATE_MASK, nd)
        done = done | (emit & (j + 1 >= B))
        return (nxt, done), ((e >> 16).astype(jnp.uint8), emit)

    _, (sym, valid) = jax.lax.scan(
        mstep, (vary(jnp.zeros(Gl, dtype=jnp.int32)),
                vary(jnp.zeros(Gl, dtype=bool))),
        (bits_loc, js))
    n_lane = valid.sum(axis=0).astype(jnp.int32)
    return sym, valid, n_lane, total[None]


@functools.lru_cache(maxsize=64)
def _compiled(mesh: Mesh, axis: str, B: int, H: int, N: int, Gl: int, D: int,
              pallas: bool, interpret: bool, check_vma: bool):
    body = functools.partial(_shard_body, B=B, H=H, N=N, Gl=Gl, D=D,
                             axis=axis, pallas=pallas, interpret=interpret)
    # check_vma: on for the XLA body; the Pallas body follows the tracked
    # CHECK_VMA_PALLAS exemption (see the module constant).
    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis), P()),
        out_specs=(P(None, axis), P(None, axis), P(axis), P(axis)),
        check_vma=check_vma)
    return jax.jit(mapped)


def lane_sharded_runner(hf, mesh: Mesh | None = None,
                        lanes: int | None = None,
                        use_pallas: bool | None = None):
    """Stage inputs once and return ``(run, materialize)``.

    ``run()`` executes only the compiled sharded program (per-shard scans
    + the stitching collective) and returns its outputs; ``materialize``
    compacts them to the dense byte stream on the host.  This is the
    benchmarking surface — scaling sweeps time ``run`` so host-side prep
    (bit-matrix build, compaction) doesn't mask the device scaling.

    ``use_pallas``: run the per-shard scans as Mosaic kernels (default:
    on TPU meshes, when the per-shard lane count allows full tiles;
    interpreter elsewhere is slower than the XLA scans, so off)."""
    if mesh is None:
        mesh = make_mesh()
    D = int(mesh.devices.size)
    dfa = build_lane_dfa(hf.tree)
    H = max(dfa.height, 1)
    G = pick_lanes(hf.bits) if lanes is None else int(lanes)
    G = max(D, min(G, hf.bits // H if hf.bits >= H else 1))
    G = -(-G // D) * D  # divisible by the mesh
    from huffmandecoderongpus_tpu.ops.pallas_lanedfa import LANE_TILE, _pad_table

    on_tpu = mesh.devices.flat[0].platform == "tpu"
    pallas_ok = (G // D) % LANE_TILE == 0
    # default: Mosaic kernels on TPU meshes (HW-validated 2026-08-17);
    # XLA scans elsewhere (Pallas interpret is slower than the XLA path)
    pallas = bool(use_pallas) if use_pallas is not None else (on_tpu and pallas_ok)
    if pallas and not pallas_ok:
        raise ValueError(
            f"use_pallas needs per-shard lanes divisible by {LANE_TILE}")
    interpret = pallas and not on_tpu
    mat, B = bits_matrix(hf.payload, hf.bits, G, H, round_to=512)
    fn = _compiled(mesh, BLOCK_AXIS, B, H, int(hf.bits), G // D, D,
                   pallas, interpret,
                   CHECK_VMA_PALLAS if pallas else True)
    tab = _pad_table(dfa.entry) if pallas else dfa.entry
    mat_j = jnp.asarray(mat)
    tab_j = jnp.asarray(tab)

    def run():
        return fn(mat_j, tab_j)

    def materialize(out):
        sym, valid, n_lane, total = out
        return np.asarray(sym).T[np.asarray(valid).T], int(np.asarray(total)[0])

    return run, materialize


def decode_lane_sharded(hf, mesh: Mesh | None = None,
                        lanes: int | None = None,
                        check_size: bool = True,
                        use_pallas: bool | None = None) -> np.ndarray:
    """Lane-DFA decode with lanes sharded over a device mesh (see
    ``lane_sharded_runner`` for the staged benchmarking surface)."""
    run, materialize = lane_sharded_runner(hf, mesh=mesh, lanes=lanes,
                                           use_pallas=use_pallas)
    out, total = materialize(run())
    if check_size and total != hf.uncompressed_size:
        raise RuntimeError(
            f"decoded {total} symbols, header says {hf.uncompressed_size}")
    if check_size and out.size != hf.uncompressed_size:
        raise RuntimeError(
            f"emitted {out.size} symbols, header says {hf.uncompressed_size}")
    return out


# ---------------------------------------------------------------------------
# Widescan shard bodies: the round-2 fused decoder (ops/pallas_widescan)
# sharded over the lane axis — per-shard K1 chunked scans, the same tiny
# exit-map all_gather as above, then local fix-splice + dense compaction,
# so the multi-chip path produces dense bytes per shard.


def _wide_shard_body(wmat_loc, tabq, lim_loc, *, plan, H, md, C0, C1, NS,
                     Gl, D, axis, NGl, Rgl, interpret):
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    p = plan
    Rl = Gl // 128
    sym, val, cntmap, exmap, mrowmap = ws.k1_scan2(
        wmat_loc, tabq, lim_loc, B=p["B"], H=H, G=Gl, steps=p["steps"],
        steps_p=p["steps_p"], SEG=p["SEG"], UNROLL=p["UNROLL"], md=md,
        C0=C0, C1=C1, NS=NS, RB=min(p["RB"], Rl), interpret=interpret)
    HP = cntmap.shape[0]
    cnt2 = cntmap.reshape(HP, Gl)
    mrow2 = mrowmap.reshape(HP, Gl)

    def to_k2(m):
        m2 = m.reshape(HP, Gl).T.reshape(NGl, Rgl, HP).transpose(1, 0, 2)
        return jnp.pad(m2, ((0, 0), (0, 0), (0, 128 - HP)))

    ex3 = to_k2(exmap)
    # pre-collective: the shard's composite exit map (exit offset for
    # each possible shard-entry); one tiny all_gather + a D-step serial
    # fold finds every shard's true entry — the same role as the
    # reference's per-level host readback, in one collective
    _, tot = ws.k2_compose(ex3, jnp.zeros((1, 1), jnp.int32),
                           Rg=Rgl, NG=NGl, interpret=interpret)
    tot_i = tot[0].astype(jnp.int32)
    all_tot = jax.lax.all_gather(tot_i, axis)  # (D, 128)
    d = jax.lax.axis_index(axis).astype(jnp.int32)

    def comp(k, carry):
        e, my_e = carry
        my_e = jnp.where(k == d, e, my_e)
        return all_tot[k, e], my_e

    _, my_e = jax.lax.fori_loop(0, D, comp, (jnp.int32(0), jnp.int32(0)))

    # post-collective: per-lane entries seeded at the shard's true entry
    ent3, _ = ws.k2_compose(ex3, my_e.reshape(1, 1).astype(jnp.int32),
                            Rg=Rgl, NG=NGl, interpret=interpret)
    entry = ent3[:, :, 0].T.reshape(Gl).astype(jnp.int32)

    mrow_sel = ws._select_h(mrow2, entry, HP)
    n = ws._select_h(cnt2, entry, HP)
    total = jax.lax.psum(jnp.sum(n), axis)
    lim_flat = lim_loc.reshape(Gl)
    cut = jnp.where(entry == 0, 0, mrow_sel + 1)
    cut = jnp.where(lim_flat > 0, cut, 0)
    cut_slot = jnp.where(cut > 0, (cut - 1) // md + 1, 0)

    msym, mval = ws.k3_fix2(
        wmat_loc, tabq, entry.reshape(Rl, 128), cut.reshape(Rl, 128),
        cut_slot.reshape(Rl, 128), sym, val, G=Gl, steps_p=p["steps_p"],
        SEG=p["SEG"], UNROLL=p["UNROLL"], md=md, C0=C0, C1=C1, NS=NS,
        RB=min(p["RB"], Rl), interpret=interpret)
    denseT = ws.k4_compact(msym, mval, G=Gl,
                           cells_p=p["steps_p"] // md // ws.CELL,
                           ORP=p["ORP"], interpret=interpret)
    # fence: data-dependent on the LAST kernel so a 1-element readback
    # brackets the whole shard program (the relay's block_until_ready
    # can return early; cf. wide_decode_program's fence)
    fence = total + denseT[0, 0].astype(jnp.int32)
    return denseT, n, total[None], fence[None]


@functools.lru_cache(maxsize=32)
def _compiled_wide(mesh: Mesh, axis: str, plan_items, H: int, md: int,
                   C0: int, C1: int, NS: int, Gl: int, D: int,
                   interpret: bool, check_vma: bool):
    plan = dict(plan_items)
    # composition group split for the per-shard K2 (same rule as _plan)
    NGl = 1 << ((Gl // 128).bit_length() // 2 + 3)
    NGl = min(NGl, Gl)
    Rgl = Gl // NGl
    body = functools.partial(_wide_shard_body, plan=plan, H=H, md=md,
                             C0=C0, C1=C1, NS=NS, Gl=Gl, D=D, axis=axis,
                             NGl=NGl, Rgl=Rgl, interpret=interpret)
    # check_vma follows the tracked CHECK_VMA_PALLAS exemption (module
    # constant above): pallas_call-in-shard_map vma limitation
    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None), P(), P(axis, None)),
        out_specs=(P(axis, None), P(axis), P(axis), P(axis)),
        check_vma=check_vma)

    def staged(w2, tabq, lim2):
        # device-side staging (round 4): the halo'd word matrix is built
        # by XLA from the lane payload words INSIDE the jitted program —
        # GSPMD shards the transpose along the lane axis and inserts the
        # one-lane halo exchange between neighboring shards itself, so
        # per-shard staging is device-side (the precondition for
        # load-balanced multi-chip decode; VERDICT round-3 item 8)
        from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

        wmat = ws.words_matrix_device(w2, -(-plan["steps_p"] // 32))
        return mapped(wmat, tabq, lim2)

    return jax.jit(staged)


def lane_sharded_wide_runner(hf, mesh: Mesh | None = None,
                             lanes: int | None = None,
                             interpret: bool | None = None):
    """Stage the widescan-sharded decode; returns ``(run, materialize)``.

    Requires a tree inside the widescan chunked envelope (<= 1023
    states, min code length >= 2 with chunk-friendly geometry) — callers
    fall back to ``lane_sharded_runner`` on ``EnvelopeError``."""
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    if mesh is None:
        mesh = make_mesh()
    D = int(mesh.devices.size)
    # per-shard lane count floored at 512 (4 sublane rows): the smallest
    # geometry whose Mosaic gathers are HW-validated (dynamic_gather
    # mis-lowers below that; see pallas_widescan._plan)
    st = ws.stage_widescan_inputs(hf, lanes=lanes)
    if not st["chunk2"]:
        raise ws.EnvelopeError("tree/geometry not chunk2-eligible")
    G0 = st["plan"]["G"]
    G = -(-max(G0, 512 * D) // (128 * D)) * 128 * D
    if G != G0:
        st = ws.stage_widescan_inputs(hf, lanes=G)
        G = st["plan"]["G"]  # pow2-rounded up by _plan
        if G % (128 * D):
            # pow2 lane counts divide pow2 meshes; reject others
            raise ws.EnvelopeError(
                f"lane count {G} not divisible over {D} shards")
        if not st["chunk2"]:
            raise ws.EnvelopeError("tree/geometry not chunk2-eligible")
    p = st["plan"]
    Gl = G // D
    if Gl < 512:
        raise ws.EnvelopeError("fewer than 512 lanes per shard")
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"
    fn = _compiled_wide(mesh, BLOCK_AXIS, tuple(sorted(p.items())),
                        st["H"], st["md"], st["C0"], st["C1"], st["NS"],
                        Gl, D, interpret, CHECK_VMA_PALLAS)
    w2, tq, l2 = st["words"], st["tabw"], st["lim2"]
    ORP = p["ORP"]

    def run():
        return fn(w2, tq, l2)

    def materialize(out):
        denseT, n, total, _fence = out
        dense = np.asarray(denseT)
        counts = np.asarray(n)
        if counts.max(initial=0) > ORP:
            raise OverflowError("a lane overflowed the dense buffer")
        mask = np.arange(ORP)[None, :] < counts[:, None]
        return dense[mask], int(np.asarray(total)[0])

    return run, materialize


# ---------------------------------------------------------------------------
# Indexed shard bodies: `.huffidx` blocks sharded over the mesh.  Index
# blocks all start at codeword boundaries, so every shard runs ONLY the
# chunked main scan + dense compaction (k1_scan2 discover=False ->
# k4_compact): no discovery, no composition, no fix scan, and — unlike
# the discovery-based bodies above — NO collective at all (per-lane
# symbol counts are exact from the index).  This is the load-balanced
# multi-chip path: every shard's worst case is bounded by the longest
# index block instead of a self-sync tail (VERDICT round-4 missing #3;
# single-chip dispatch policy for the indexed program is unchanged,
# DESIGN.md round-3 decision table).


def _indexed_shard_body(raw_loc, sh_loc, tabq, lim_loc, *, plan, H, md,
                        C0, C1, NS, Gl, RBl, interpret):
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    p = plan
    Rl = Gl // 128
    # device-side per-lane bit alignment + transpose, inside the shard
    w2 = ws.normalize_lane_words(raw_loc, sh_loc)
    wmat = w2.T.reshape(-(-p["steps_p"] // 32), Rl, 128)
    sym, val, *_ = ws.k1_scan2(
        wmat, tabq, lim_loc, B=p["B"], H=H, G=Gl, steps=p["steps_p"],
        steps_p=p["steps_p"], SEG=p["SEG"], UNROLL=p["UNROLL"], md=md,
        C0=C0, C1=C1, NS=NS, RB=RBl, discover=False, interpret=interpret)
    denseT = ws.k4_compact(sym, val, G=Gl,
                           cells_p=p["steps_p"] // md // ws.CELL,
                           ORP=p["ORP"], interpret=interpret)
    # fence: data-dependent on the last kernel (cf. _wide_shard_body)
    fence = denseT[0, 0].astype(jnp.int32) + denseT[Gl - 1, 0].astype(
        jnp.int32)
    return denseT, fence[None]


def _rb_for(R: int, SEG: int) -> int:
    """Row-group blocking for an R-sublane-row shard: the largest
    HW-validated block (<= 32 rows, >= 4 — Mosaic's lane-axis
    dynamic_gather floor) dividing R, halved for long segments (cf.
    stage_widescan_indexed's rule)."""
    for rb in (32, 16, 8, 4):
        if R % rb == 0:
            return min(rb, 16) if SEG > 96 else rb
    raise ValueError(f"shard row count {R} not divisible by any block")


@functools.lru_cache(maxsize=32)
def _compiled_indexed(mesh: Mesh, axis: str, plan_items, H: int, md: int,
                      C0: int, C1: int, NS: int, Gl: int, RBl: int,
                      interpret: bool, check_vma: bool):
    plan = dict(plan_items)
    body = functools.partial(_indexed_shard_body, plan=plan, H=H, md=md,
                             C0=C0, C1=C1, NS=NS, Gl=Gl, RBl=RBl,
                             interpret=interpret)
    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(), P(axis, None)),
        out_specs=(P(axis, None), P(axis)),
        check_vma=check_vma)
    return jax.jit(mapped)


def lane_sharded_indexed_runner(hf, offsets, block_symbols: int,
                                mesh: Mesh | None = None,
                                interpret: bool | None = None):
    """Stage the index-sharded decode; returns ``(run, materialize)``.

    The `.huffidx` block boundaries ARE the lanes (cf.
    ops/pallas_widescan.stage_widescan_indexed), sharded contiguously
    over the mesh.  Raises EnvelopeError outside the indexed chunked
    envelope or when the padded lane count does not divide over the
    mesh."""
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    if mesh is None:
        mesh = make_mesh()
    D = int(mesh.devices.size)
    # pad lanes to 512*D so every shard gets whole, >= 4-row row groups
    # (excess lanes are all-PAD: lim <= 0, zero counts)
    st = ws.stage_widescan_indexed(hf, offsets, block_symbols,
                                   lane_multiple=512 * D)
    p = st["plan"]
    # (no ORP overflow check: staging sizes ORP = ceil(block_symbols/128)
    # *128 >= block_symbols, so indexed lanes cannot overflow)
    G = p["G"]
    if G % (128 * D):
        raise ws.EnvelopeError(
            f"lane count {G} not divisible over {D} shards")
    Gl = G // D
    Rl = Gl // 128
    if Rl < 4:
        raise ws.EnvelopeError("fewer than 512 lanes per shard")
    try:
        RBl = _rb_for(Rl, p["SEG"])
    except ValueError as e:
        raise ws.EnvelopeError(str(e))
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"
    fn = _compiled_indexed(mesh, BLOCK_AXIS, tuple(sorted(p.items())),
                           st["H"], st["md"], st["C0"], st["C1"], st["NS"],
                           Gl, RBl, interpret, CHECK_VMA_PALLAS)
    raw, sh, tq, l2 = st["raw"], st["sh"], st["tabw"], st["lim2"]
    counts = st["counts"]
    ORP = p["ORP"]

    def run():
        return fn(raw, sh, tq, l2)

    def materialize(out):
        denseT, _fence = out
        dense = np.asarray(denseT)
        mask = np.arange(ORP)[None, :] < counts[:, None]
        return dense[mask]

    return run, materialize


def decode_lane_sharded_indexed(hf, offsets, block_symbols: int,
                                mesh: Mesh | None = None,
                                check_size: bool = True,
                                interpret: bool | None = None) -> np.ndarray:
    """Widescan decode with `.huffidx` blocks sharded over a device mesh:
    no discovery, no collective, per-shard dense bytes with a bounded
    worst case (the longest index block).  Raises EnvelopeError for
    callers to fall back (e.g. to ``decode_lane_sharded_wide``)."""
    run, materialize = lane_sharded_indexed_runner(
        hf, offsets, block_symbols, mesh=mesh, interpret=interpret)
    out = materialize(run())
    if check_size and out.size != hf.uncompressed_size:
        raise RuntimeError(
            f"emitted {out.size} symbols, header says {hf.uncompressed_size}")
    return out


def decode_lane_sharded_wide(hf, mesh: Mesh | None = None,
                             lanes: int | None = None,
                             check_size: bool = True,
                             interpret: bool | None = None) -> np.ndarray:
    """Widescan decode with lanes sharded over a device mesh: dense bytes
    come back per shard; falls back to ``decode_lane_sharded`` when the
    tree is outside the widescan envelope or a lane overflows."""
    from huffmandecoderongpus_tpu.ops.pallas_widescan import EnvelopeError

    try:
        run, materialize = lane_sharded_wide_runner(
            hf, mesh=mesh, lanes=lanes, interpret=interpret)
        out, total = materialize(run())
    except (EnvelopeError, OverflowError):
        return decode_lane_sharded(hf, mesh=mesh, lanes=lanes,
                                   check_size=check_size)
    if check_size and total != hf.uncompressed_size:
        raise RuntimeError(
            f"decoded {total} symbols, header says {hf.uncompressed_size}")
    if check_size and out.size != hf.uncompressed_size:
        raise RuntimeError(
            f"emitted {out.size} symbols, header says {hf.uncompressed_size}")
    return out
