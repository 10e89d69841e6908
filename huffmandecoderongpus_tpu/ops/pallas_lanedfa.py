"""Pallas (Mosaic) kernels for the lane-parallel bit-DFA decode.

The XLA implementation (ops/lanedfa.py) spends its time in `small_gather`
select-trees.  Mosaic exposes the actual TPU vector-gather instruction
(`tpu.dynamic_gather`) through exactly one pattern — 2D same-shape
``jnp.take_along_axis`` along sublanes (axis 0) or lanes (axis 1)
(jax/_src/pallas/mosaic/lowering.py:2464-2525) — and this module is built
around it:

  * The fused transition table (<= 1024 entries) is split into 128-entry
    chunks.  A chunk broadcast to an (8, 128) tile serves 1024 independent
    lookups with ONE axis=1 dynamic_gather; chunks combine with selects.
    Lookup cost: ~(chunks + selects) vector ops per 1024 lanes per step —
    two orders of magnitude past the XLA select-tree path.
  * Lanes are processed in tiles of ``LANE_TILE`` = 1024 (a full 8x128
    vreg); the grid walks lane tiles, and each kernel instance scans its
    tile's B+H bit rows with a `fori_loop`, emitting padded (step, lane)
    symbols exactly like the XLA path.

The kernels mirror ops/lanedfa.py's three scans (main, candidate discovery,
indexed) and reuse its table builder, bit-matrix layout, and composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from huffmandecoderongpus_tpu.ops.lanedfa import (
    EMIT_BIT,
    STATE_MASK,
    _compose,
    build_lane_dfa,
    bits_matrix,
    pick_lanes,
)

import os as _os

LANE_TILE = 1024  # lanes per kernel instance: one full 8x128 int32 vreg
CHUNK = 128  # table entries per dynamic_gather (the lane width)
#: in-kernel steps per fori iteration (amortizes loop overhead)
UNROLL = int(_os.environ.get("HUFF_PALLAS_UNROLL", "8"))


def _pad_table(entry: np.ndarray) -> np.ndarray:
    """Pad the fused table to (n_chunks, 128) int32."""
    t = entry.shape[0]
    n_chunks = max(-(-t // CHUNK), 1)
    out = np.zeros((n_chunks, CHUNK), dtype=np.int32)
    out.reshape(-1)[:t] = entry
    return out


def _chunked_lookup(tab_ref, idx):
    """``table[idx]`` for idx (8, 128) via per-chunk lane gathers."""
    n_chunks = tab_ref.shape[0]
    lo = idx & (CHUNK - 1)
    hi = idx >> 7
    out = jnp.take_along_axis(
        jnp.broadcast_to(tab_ref[0, :], (8, CHUNK)), lo, axis=1)
    for c in range(1, n_chunks):
        cand = jnp.take_along_axis(
            jnp.broadcast_to(tab_ref[c, :], (8, CHUNK)), lo, axis=1)
        out = jnp.where(hi == c, cand, out)
    return out


def _main_kernel(tab_ref, off_ref, lim_ref, bits_ref, sym_ref, valid_ref, *,
                 B, H, G, steps, steps_p):
    """One lane tile: scan B+H bit rows from per-lane entry offsets.

    4D (tile, steps, 8, 128) layout: every ref access is a whole (8, 128)
    tile — no cross-lane reshapes, which Mosaic cannot lower.  lim_ref
    holds each lane's remaining-stream bound (N - lane_base) as data, so
    the same kernel serves sharded callers whose lane offsets are traced."""
    j0 = off_ref[...]
    lim = lim_ref[...]

    def step(i, carry):
        node, done = carry  # done is int32 0/1: Mosaic rejects bool carries
        for u in range(UNROLL):  # python-unrolled: amortizes loop overhead
            j = i * UNROLL + u
            bit = bits_ref[j].astype(jnp.int32)
            e = _chunked_lookup(tab_ref, node * 2 + bit)
            active = (j >= j0) & (done == 0) & (j < steps) & (j < lim)
            emit = active & ((e & EMIT_BIT) != 0)
            node = jnp.where(active, e & STATE_MASK, node)
            done = jnp.where(emit & (j + 1 >= B), 1, done)
            sym_ref[j] = (e >> 16).astype(jnp.uint8)
            valid_ref[j] = emit.astype(jnp.uint8)
        return node, done

    node0 = jnp.zeros((8, CHUNK), dtype=jnp.int32)
    done0 = jnp.zeros((8, CHUNK), dtype=jnp.int32)
    jax.lax.fori_loop(0, steps_p // UNROLL, step, (node0, done0))


def _to_tiles(arr2d, steps, G):
    """(steps, G) -> (T, steps, 8, 128) tile layout (device-side XLA op)."""
    T = G // LANE_TILE
    return arr2d.reshape(steps, T, 8, CHUNK).transpose(1, 0, 2, 3)


def _from_tiles(arr4d, steps, G):
    """(T, steps, 8, 128) -> (steps, G)."""
    return arr4d.transpose(1, 0, 2, 3).reshape(steps, G)


@functools.partial(jax.jit, static_argnames=("B", "H", "N", "G", "interpret",
                                             "vma"))
def lane_scan_pallas_tiled(bits4, entry_tab_chunks, off4, *, B, H, N, G,
                           interpret=False, lim4=None, vma=None):
    """Tiled-layout main scan: bits4 (T, steps, 8, 128) u8, off4
    (T, 8, 128) i32 -> (sym4, valid4) (T, steps, 8, 128) u8.

    ``lim4``: optional per-lane stream bound (T, 8, 128) i32 overriding the
    default N - lane_base (used by sharded callers with traced offsets)."""
    steps = B + H
    steps_p = -(-steps // UNROLL) * UNROLL
    T = G // LANE_TILE
    if steps_p != steps:
        bits4 = jnp.pad(bits4, ((0, 0), (0, steps_p - steps), (0, 0), (0, 0)))
    if lim4 is None:
        lane = jnp.arange(G, dtype=jnp.int32).reshape(T, 8, CHUNK)
        lim4 = N - lane * B
    kern = functools.partial(_main_kernel, B=B, H=H, G=G, steps=steps,
                             steps_p=steps_p)
    sym4, valid4 = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((entry_tab_chunks.shape[0], CHUNK), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, CHUNK), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, CHUNK), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, steps_p, 8, CHUNK), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, steps_p, 8, CHUNK), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, steps_p, 8, CHUNK), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, steps_p, 8, CHUNK), jnp.uint8,
                                 vma=set(vma) if vma else None),
            jax.ShapeDtypeStruct((T, steps_p, 8, CHUNK), jnp.uint8,
                                 vma=set(vma) if vma else None),
        ],
        interpret=interpret,
    )(entry_tab_chunks, off4, lim4, bits4)
    return sym4[:, :steps], valid4[:, :steps]


@functools.partial(jax.jit, static_argnames=("B", "H", "N", "G", "interpret"))
def lane_scan_pallas(bits_t, entry_tab_chunks, start_off, *, B, H, N, G,
                     interpret=False):
    """Pallas main scan. bits_t (B+H, G) u8, start_off (G,) i32.
    Returns (sym (B+H, G) u8, valid (B+H, G) u8).  G % LANE_TILE == 0."""
    steps = B + H
    T = G // LANE_TILE
    sym4, valid4 = lane_scan_pallas_tiled(
        _to_tiles(bits_t, steps, G), entry_tab_chunks,
        start_off.reshape(T, 8, CHUNK), B=B, H=H, N=N, G=G,
        interpret=interpret)
    return _from_tiles(sym4, steps, G), _from_tiles(valid4, steps, G)


def _main_kernel_cum(tab_ref, off_ref, lim_ref, bits_ref, sym_ref, cum_ref, *,
                     B, H, G, steps, steps_p):
    """Main scan emitting (sym u8, inclusive emission count i32) per row —
    the exact inputs the compaction kernel needs (no separate cumsum pass).
    """
    j0 = off_ref[...]
    lim = lim_ref[...]

    def step(i, carry):
        node, done, cnt = carry
        for u in range(UNROLL):
            j = i * UNROLL + u
            bit = bits_ref[j].astype(jnp.int32)
            e = _chunked_lookup(tab_ref, node * 2 + bit)
            active = (j >= j0) & (done == 0) & (j < steps) & (j < lim)
            emit = active & ((e & EMIT_BIT) != 0)
            node = jnp.where(active, e & STATE_MASK, node)
            done = jnp.where(emit & (j + 1 >= B), 1, done)
            cnt = cnt + emit.astype(jnp.int32)
            sym_ref[j] = (e >> 16).astype(jnp.uint8)
            cum_ref[j] = cnt
        return node, done, cnt

    z = jnp.zeros((8, CHUNK), dtype=jnp.int32)
    jax.lax.fori_loop(0, steps_p // UNROLL, step, (z, z, z))


def _compact_tiled_kernel(cum_ref, sym_ref, out_ref, n_ref, *, steps,
                          steps_p, out_rows):
    """Tiled compaction: binary-search gather along the steps axis (see
    _compact_kernel); also emits per-lane counts.  Mosaic's dynamic_gather
    is strictly 2D, so the 3D tile is processed one sublane at a time on
    2D (steps_p, 128) slices (8 unrolled passes)."""
    for s in range(8):
        cum = cum_ref[:, s, :]  # (steps_p, 128)
        want = jax.lax.broadcasted_iota(jnp.int32, (steps_p, CHUNK), 0) + 1
        pos = jnp.zeros((steps_p, CHUNK), dtype=jnp.int32)
        k = 1 << max(steps.bit_length() - 1, 0)
        while k:
            npos = pos + k
            idx = jnp.minimum(npos - 1, steps - 1)
            c = jnp.take_along_axis(cum, idx, axis=0)
            pos = jnp.where((npos <= steps) & (c < want), npos, pos)
            k >>= 1
        row = jnp.minimum(pos, steps - 1)
        gathered = jnp.take_along_axis(sym_ref[:, s, :], row, axis=0)
        out_ref[:, s, :] = gathered[:out_rows]
        n_ref[s, :] = cum[steps - 1]


@functools.partial(jax.jit, static_argnames=("B", "H", "N", "G", "out_rows",
                                             "interpret"))
def lane_decode_dense_pallas_tiled(bits4, entry_tab_chunks, off4, *, B, H, N,
                                   G, out_rows, interpret=False):
    """Main scan + on-device compaction: returns (dense4 (T, out_rows, 8,
    128) u8, counts (T, 8, 128) i32) — each lane's symbols packed to the
    top of its column."""
    steps = B + H
    steps_p = -(-steps // UNROLL) * UNROLL
    T = G // LANE_TILE
    if steps_p != steps:
        bits4 = jnp.pad(bits4, ((0, 0), (0, steps_p - steps), (0, 0), (0, 0)))
    lane = jnp.arange(G, dtype=jnp.int32).reshape(T, 8, CHUNK)
    lim4 = N - lane * B
    kern = functools.partial(_main_kernel_cum, B=B, H=H, G=G,
                             steps=steps, steps_p=steps_p)
    sym4, cum4 = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((entry_tab_chunks.shape[0], CHUNK), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, CHUNK), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, CHUNK), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, steps_p, 8, CHUNK), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, steps_p, 8, CHUNK), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, steps_p, 8, CHUNK), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, steps_p, 8, CHUNK), jnp.uint8),
            jax.ShapeDtypeStruct((T, steps_p, 8, CHUNK), jnp.int32),
        ],
        interpret=interpret,
    )(entry_tab_chunks, off4, lim4, bits4)

    ckern = functools.partial(_compact_tiled_kernel, steps=steps,
                              steps_p=steps_p, out_rows=out_rows)
    dense4, counts = pl.pallas_call(
        ckern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((None, steps_p, 8, CHUNK), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, steps_p, 8, CHUNK), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, out_rows, 8, CHUNK), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, CHUNK), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, out_rows, 8, CHUNK), jnp.uint8),
            jax.ShapeDtypeStruct((T, 8, CHUNK), jnp.int32),
        ],
        interpret=interpret,
    )(cum4, sym4)
    return dense4, counts


def _candidate_kernel(tab_ref, lim_ref, bits_ref, cnt_ref, ex_ref, *, B, H,
                      steps, steps_p):
    """All H candidate chains for one lane tile (carriers (H, 8, 128))."""
    lim = lim_ref[...][None]
    offs = jax.lax.broadcasted_iota(jnp.int32, (H, 8, CHUNK), 0)

    def lookup3(idx):
        flat = idx.reshape(H * 8, CHUNK)
        n_chunks = tab_ref.shape[0]
        lo = flat & (CHUNK - 1)
        hi = flat >> 7
        out = jnp.take_along_axis(
            jnp.broadcast_to(tab_ref[0, :], (H * 8, CHUNK)), lo, axis=1)
        for c in range(1, n_chunks):
            cand = jnp.take_along_axis(
                jnp.broadcast_to(tab_ref[c, :], (H * 8, CHUNK)), lo, axis=1)
            out = jnp.where(hi == c, cand, out)
        return out.reshape(H, 8, CHUNK)

    def step(i, carry):
        node, cnt, ex, done = carry  # done int32 (no bool carries in Mosaic)
        for u in range(UNROLL):  # python-unrolled
            j = i * UNROLL + u
            bit = bits_ref[j][None].astype(jnp.int32)  # (1, 8, 128) broadcast
            e = lookup3(node * 2 + bit)
            active = (j >= offs) & (done == 0) & (j < steps) & (j < lim)
            emit = active & ((e & EMIT_BIT) != 0)
            node = jnp.where(active, e & STATE_MASK, node)
            cnt = cnt + emit.astype(jnp.int32)
            exiting = emit & (j + 1 >= B)
            ex = jnp.where(exiting, j + 1 - B, ex)
            done = jnp.where(exiting, 1, done)
        return node, cnt, ex, done

    z = jnp.zeros((H, 8, CHUNK), dtype=jnp.int32)
    node, cnt, ex, done = jax.lax.fori_loop(
        0, steps_p // UNROLL, step, (z, z, z, z))
    cnt_ref[...] = cnt
    ex_ref[...] = ex


@functools.partial(jax.jit, static_argnames=("B", "H", "N", "G", "interpret",
                                             "vma"))
def candidate_scan_pallas_tiled(bits4, entry_tab_chunks, *, B, H, N, G,
                                interpret=False, lim4=None, vma=None):
    """Tiled candidate scan: bits4 (T, steps, 8, 128) -> (cnt (H, G),
    exit_off (H, G)) int32 (candidate maps are tiny, returned 2D)."""
    steps = B + H
    steps_p = -(-steps // UNROLL) * UNROLL
    T = G // LANE_TILE
    if steps_p != steps:
        bits4 = jnp.pad(bits4, ((0, 0), (0, steps_p - steps), (0, 0), (0, 0)))
    if lim4 is None:
        lane = jnp.arange(G, dtype=jnp.int32).reshape(T, 8, CHUNK)
        lim4 = N - lane * B
    kern = functools.partial(_candidate_kernel, B=B, H=H, steps=steps,
                             steps_p=steps_p)
    cnt4, ex4 = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((entry_tab_chunks.shape[0], CHUNK), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, CHUNK), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, steps_p, 8, CHUNK), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, H, 8, CHUNK), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, H, 8, CHUNK), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, H, 8, CHUNK), jnp.int32,
                                 vma=set(vma) if vma else None),
            jax.ShapeDtypeStruct((T, H, 8, CHUNK), jnp.int32,
                                 vma=set(vma) if vma else None),
        ],
        interpret=interpret,
    )(entry_tab_chunks, lim4, bits4)
    cnt = cnt4.transpose(1, 0, 2, 3).reshape(H, G)
    ex = ex4.transpose(1, 0, 2, 3).reshape(H, G)
    return cnt, ex


@functools.partial(jax.jit, static_argnames=("B", "H", "N", "G", "interpret"))
def candidate_scan_pallas(bits_t, entry_tab_chunks, *, B, H, N, G,
                          interpret=False):
    """Pallas candidate scan over (B+H, G) bits (untiled convenience)."""
    steps = B + H
    return candidate_scan_pallas_tiled(
        _to_tiles(bits_t, steps, G), entry_tab_chunks,
        B=B, H=H, N=N, G=G, interpret=interpret)


def _indexed_kernel(tab_ref, len_ref, bits_ref, sym_ref, valid_ref, *, steps,
                    steps_p):
    """Symbol-aligned lanes (sidecar path): lane g starts on a codeword
    boundary at row 0 and ends exactly at row len_ref[g].  4D tile layout
    (see _main_kernel)."""
    lane_len = len_ref[...]

    def step(i, node):
        for u in range(UNROLL):
            j = i * UNROLL + u
            bit = bits_ref[j].astype(jnp.int32)
            e = _chunked_lookup(tab_ref, node * 2 + bit)
            active = (j < lane_len) & (j < steps)
            emit = active & ((e & EMIT_BIT) != 0)
            node = jnp.where(active, e & STATE_MASK, node)
            sym_ref[j] = (e >> 16).astype(jnp.uint8)
            valid_ref[j] = emit.astype(jnp.uint8)
        return node

    jax.lax.fori_loop(0, steps_p // UNROLL, step,
                      jnp.zeros((8, CHUNK), dtype=jnp.int32))


@functools.partial(jax.jit, static_argnames=("B", "G", "interpret"))
def lane_scan_indexed_pallas(bits_t, entry_tab_chunks, lane_len, *, B, G,
                             interpret=False):
    """Pallas indexed scan: (B, G) bits, per-lane exact lengths."""
    steps = B
    steps_p = -(-steps // UNROLL) * UNROLL
    T = G // LANE_TILE
    bits4 = _to_tiles(bits_t, steps, G)
    if steps_p != steps:
        bits4 = jnp.pad(bits4, ((0, 0), (0, steps_p - steps), (0, 0), (0, 0)))
    len4 = lane_len.reshape(T, 8, CHUNK)
    kern = functools.partial(_indexed_kernel, steps=steps, steps_p=steps_p)
    sym4, valid4 = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((entry_tab_chunks.shape[0], CHUNK), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, CHUNK), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, steps_p, 8, CHUNK), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, steps_p, 8, CHUNK), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, steps_p, 8, CHUNK), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, steps_p, 8, CHUNK), jnp.uint8),
            jax.ShapeDtypeStruct((T, steps_p, 8, CHUNK), jnp.uint8),
        ],
        interpret=interpret,
    )(entry_tab_chunks, len4, bits4)
    return (_from_tiles(sym4[:, :steps], steps, G),
            _from_tiles(valid4[:, :steps], steps, G))


def decode_lanedfa_indexed_pallas(hf, offsets, block_symbols: int,
                                  check_size: bool = True,
                                  interpret: bool = False) -> np.ndarray:
    """Sidecar-indexed Pallas decode: no discovery, exact per-lane counts."""
    from huffmandecoderongpus_tpu.huffio.bitio import unpack_bits
    from huffmandecoderongpus_tpu.ops.lanedfa import decode_lanedfa_indexed

    offsets = np.asarray(offsets, dtype=np.int64)
    G0 = offsets.shape[0]
    if G0 < LANE_TILE // 4:  # too few blocks to be worth a kernel launch
        return decode_lanedfa_indexed(hf, offsets, block_symbols,
                                      check_size=check_size)
    dfa = build_lane_dfa(hf.tree)
    ends = np.append(offsets[1:], hf.bits)
    lens = ends - offsets
    if np.any(lens < 0) or (G0 and offsets[0] != 0):
        raise ValueError("corrupt block index: offsets not increasing from 0")
    B = int(lens.max(initial=1))
    G = -(-G0 // LANE_TILE) * LANE_TILE  # pad with zero-length lanes

    flat = np.zeros(hf.bits + B, dtype=np.uint8)
    flat[: hf.bits] = unpack_bits(hf.payload, hf.bits)
    offs_pad = np.zeros(G, dtype=np.int64)
    offs_pad[:G0] = offsets
    lens_pad = np.zeros(G, dtype=np.int64)
    lens_pad[:G0] = lens
    idx = offs_pad[None, :] + np.arange(B)[:, None]
    mat = flat[idx]

    sym, valid = lane_scan_indexed_pallas(
        jnp.asarray(mat), jnp.asarray(_pad_table(dfa.entry)),
        jnp.asarray(lens_pad, dtype=jnp.int32), B=B, G=G, interpret=interpret)
    out = np.asarray(sym).T[np.asarray(valid).T.astype(bool)]
    if check_size and out.size != hf.uncompressed_size:
        raise RuntimeError(
            f"decoded {out.size} symbols, header says {hf.uncompressed_size}")
    return out


def _compact_kernel(cum_ref, sym_ref, out_ref, *, steps, out_rows):
    """Per-column stable compaction as gathers (no scatter):

    out[i, g] = sym[r, g] where r is the row of column g's (i+1)-th
    emission — found by branchless binary search over the column's
    inclusive emission prefix-count `cum`, using axis-0 dynamic_gather.
    Mosaic requires gather operand and indices to share one shape, so the
    search runs at the full (steps, tile) shape and the leading out_rows
    rows are written out; rows past a column's count read garbage that the
    caller masks via the counts.
    """
    want = jax.lax.broadcasted_iota(jnp.int32, (steps, LANE_TILE), 0) + 1
    pos = jnp.zeros((steps, LANE_TILE), dtype=jnp.int32)
    k = 1 << max(steps.bit_length() - 1, 0)
    while k:
        npos = pos + k
        idx = jnp.minimum(npos - 1, steps - 1)
        c = jnp.take_along_axis(cum_ref[:, :], idx, axis=0)
        pos = jnp.where((npos <= steps) & (c < want), npos, pos)
        k >>= 1
    row = jnp.minimum(pos, steps - 1)
    gathered = jnp.take_along_axis(sym_ref[:, :], row, axis=0)
    out_ref[:, :] = gathered[:out_rows]


@functools.partial(jax.jit, static_argnames=("steps", "G", "out_rows", "interpret"))
def compact_pallas(cum, sym, *, steps, G, out_rows, interpret=False):
    """Compact (steps, G) padded emissions to (out_rows, G) dense-per-column
    symbols on device.  ``cum`` is the inclusive per-column emission count
    (jnp.cumsum(valid, 0)); rows >= count are unspecified."""
    kern = functools.partial(_compact_kernel, steps=steps, out_rows=out_rows)
    return pl.pallas_call(
        kern,
        grid=(G // LANE_TILE,),
        in_specs=[
            pl.BlockSpec((steps, LANE_TILE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, LANE_TILE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_rows, LANE_TILE), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, G), sym.dtype),
        interpret=interpret,
    )(cum, sym)


# ---------------------------------------------------------------------------
# Host wrapper


def decode_lanedfa_pallas(hf, lanes: int | None = None,
                          check_size: bool = True,
                          interpret: bool = False,
                          discovery: str = "candidates") -> np.ndarray:
    """Pallas lane-DFA decode.

    ``discovery="candidates"`` (default, hardware-validated): the full
    Pallas candidate kernel.  ``discovery="sync"``: one Pallas main scan
    from offset 0, then the XLA self-synchronizing short scans + splice
    (ops/lanedfa_sync.py) — the short scans are too small to benefit from
    Mosaic.  The round-2 successor (ops/pallas_widescan.py) fuses sync
    discovery into the scan kernel itself.
    """
    dfa = build_lane_dfa(hf.tree)
    H = max(dfa.height, 1)
    if hf.bits < LANE_TILE * H:
        # stream too small to fill one lane tile at >= H bits per lane;
        # the XLA path handles it (and is fast at this size anyway)
        from huffmandecoderongpus_tpu.ops.lanedfa import decode_lanedfa

        return decode_lanedfa(hf, lanes=lanes, check_size=check_size)
    G = pick_lanes(hf.bits, max_lanes=1 << 14) if lanes is None else int(lanes)
    G = max(LANE_TILE, min(G, max(hf.bits // H, 1)))
    G = (G // LANE_TILE) * LANE_TILE
    mat, B = bits_matrix(hf.payload, hf.bits, G, H, round_to=512)
    bits_t = jnp.asarray(mat)
    tab = jnp.asarray(_pad_table(dfa.entry))

    if discovery == "sync":
        from huffmandecoderongpus_tpu.ops.lanedfa_sync import discover_and_splice

        zero = jnp.zeros(G, dtype=jnp.int32)
        sym0, valid0 = lane_scan_pallas(bits_t, tab, zero, B=B, H=H,
                                        N=hf.bits, G=G, interpret=interpret)
        flat_tab = jnp.asarray(dfa.entry)
        sym, valid, base, n, total = discover_and_splice(
            bits_t, flat_tab, sym0, valid0.astype(bool), B=B, H=H,
            N=hf.bits, G=G)
    else:
        cnt, ex = candidate_scan_pallas(bits_t, tab, B=B, H=H, N=hf.bits,
                                        G=G, interpret=interpret)
        entry_off, base, n, total = _compose(cnt, ex, G=G)
        sym, valid = lane_scan_pallas(bits_t, tab, entry_off, B=B, H=H,
                                      N=hf.bits, G=G, interpret=interpret)
    if check_size and int(total) != hf.uncompressed_size:
        raise RuntimeError(
            f"decoded {int(total)} symbols, header says {hf.uncompressed_size}")

    sym_t = np.asarray(sym).T
    valid_t = np.asarray(valid).T.astype(bool)
    out = sym_t[valid_t]
    if check_size and out.size != hf.uncompressed_size:
        raise RuntimeError(
            f"emitted {out.size} symbols, header says {hf.uncompressed_size}")
    return out
