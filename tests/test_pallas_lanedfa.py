"""Pallas lane-DFA kernels, exercised in interpreter mode on CPU.

Numerical semantics must match the XLA lane-DFA exactly; the real Mosaic
compile path is covered on TPU by bench.py and the registry entry.
"""

import numpy as np
import pytest

from huffmandecoderongpus_tpu.huffio.encoder import encode_bytes
from huffmandecoderongpus_tpu.models import get_decoder
from huffmandecoderongpus_tpu.ops.pallas_lanedfa import (
    LANE_TILE,
    _pad_table,
    decode_lanedfa_pallas,
)
from huffmandecoderongpus_tpu.ops.lanedfa import build_lane_dfa


def test_pad_table_layout(paper1):
    dfa = build_lane_dfa(paper1.cd.tree)
    chunks = _pad_table(dfa.entry)
    assert chunks.shape[1] == 128
    flat = chunks.reshape(-1)[: dfa.entry.shape[0]]
    np.testing.assert_array_equal(flat, dfa.entry)


def test_pallas_paper1(paper1):
    out = decode_lanedfa_pallas(paper1.cd, lanes=LANE_TILE, interpret=True)
    np.testing.assert_array_equal(out, paper1.ucd)


def test_pallas_matches_xla_on_random(rng):
    raw = rng.integers(0, 256, size=40000, dtype=np.uint8)
    hf = encode_bytes(raw)
    from huffmandecoderongpus_tpu.ops.lanedfa import decode_lanedfa

    a = decode_lanedfa_pallas(hf, lanes=LANE_TILE, interpret=True)
    b = decode_lanedfa(hf, lanes=64)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, raw)


def test_pallas_registry_entry(paper1):
    out = get_decoder("lane_dfa_pallas")(paper1.cd)
    np.testing.assert_array_equal(out, paper1.ucd)


def test_pallas_bad_header_raises(paper1):
    hf = paper1.cd
    broken = type(hf)(tree=hf.tree, bits=hf.bits,
                      uncompressed_size=hf.uncompressed_size + 1,
                      payload=hf.payload)
    with pytest.raises(RuntimeError, match="decoded"):
        decode_lanedfa_pallas(broken, lanes=LANE_TILE, interpret=True)


def test_compact_pallas_interpret(rng):
    import jax.numpy as jnp

    from huffmandecoderongpus_tpu.ops.pallas_lanedfa import compact_pallas

    steps, G, out_rows = 77, LANE_TILE, 40
    valid = rng.random((steps, G)) < 0.3
    sym = rng.integers(0, 256, (steps, G), np.uint8)
    cum = jnp.cumsum(jnp.asarray(valid.astype(np.int32)), axis=0)
    out = np.asarray(compact_pallas(cum, jnp.asarray(sym), steps=steps, G=G,
                                    out_rows=out_rows, interpret=True))
    for g in range(0, G, 97):
        ref = sym[:, g][valid[:, g]]
        n = min(ref.size, out_rows)
        np.testing.assert_array_equal(out[:n, g], ref[:n])


def test_indexed_pallas_interpret(rng):
    from huffmandecoderongpus_tpu.huffio.encoder import encode_bytes
    from huffmandecoderongpus_tpu.ops.pallas_lanedfa import (
        decode_lanedfa_indexed_pallas)

    raw = rng.integers(0, 256, size=300000, dtype=np.uint8)
    hf = encode_bytes(raw, block_symbols=1024)  # ~293 blocks -> pallas path
    out = decode_lanedfa_indexed_pallas(hf, *hf.index, interpret=True)
    np.testing.assert_array_equal(out, raw)


def test_dense_pipeline_interpret(paper1):
    import jax.numpy as jnp

    from huffmandecoderongpus_tpu.ops import lanedfa as ld
    from huffmandecoderongpus_tpu.ops import pallas_lanedfa as pld

    dfa = ld.build_lane_dfa(paper1.cd.tree)
    H = max(dfa.height, 1)
    N = paper1.cd.bits
    G = pld.LANE_TILE
    mat, B = ld.bits_matrix(paper1.cd.payload, N, G, H, round_to=512)
    steps = B + H
    T = G // pld.LANE_TILE
    bits4 = jnp.asarray(np.ascontiguousarray(
        mat.reshape(steps, T, 8, 128).transpose(1, 0, 2, 3)))
    tab = jnp.asarray(pld._pad_table(dfa.entry))
    cnt, ex = pld.candidate_scan_pallas_tiled(bits4, tab, B=B, H=H, N=N, G=G,
                                              interpret=True)
    entry_off, base, n, total = ld._compose(cnt, ex, G=G)
    assert int(total) == paper1.cd.uncompressed_size
    out_rows = min(steps, B // max(dfa.min_depth, 1) + 2)
    dense4, counts = pld.lane_decode_dense_pallas_tiled(
        bits4, tab, entry_off.reshape(T, 8, 128), B=B, H=H, N=N, G=G,
        out_rows=out_rows, interpret=True)
    dense = np.asarray(dense4).transpose(1, 0, 2, 3).reshape(out_rows, G).T
    cnts = np.asarray(counts).reshape(G)
    got = np.concatenate([dense[g, :cnts[g]] for g in range(G)])
    np.testing.assert_array_equal(got, paper1.ucd)
