"""Wide-lane fused decoder (ops/pallas_widescan), interpreter mode on CPU.

Semantics: dense decoded bytes must equal the original corpus exactly for
random and text-like data, covering nonzero entry offsets (the fix-scan
splice), min-depth slot compression, tail-lane stream-end handling, and
the tiny-stream / >127-state fallbacks.
"""

import numpy as np
import pytest

from huffmandecoderongpus_tpu.huffio.bitio import unpack_bits
from huffmandecoderongpus_tpu.huffio.encoder import encode_bytes
from huffmandecoderongpus_tpu.ops.lanedfa import build_lane_dfa
from huffmandecoderongpus_tpu.ops.pallas_widescan import (
    decode_widescan,
    pack_pair_table,
    pack_quad_tables,
    payload_lane_words,
    words_matrix_device,
)
from huffmandecoderongpus_tpu.ops.lanedfa import EMIT_BIT, STATE_MASK


def test_pack_pair_table_semantics(paper1):
    dfa = build_lane_dfa(paper1.cd.tree)
    tabw = pack_pair_table(dfa)
    n_states = dfa.entry.shape[0] // 2
    for bit in (0, 1):
        for s in range(n_states):
            ref = int(dfa.entry[s * 2 + bit])
            e16 = (int(tabw[0, s]) >> (16 * bit)) & 0xFFFF
            if ref & EMIT_BIT:
                assert e16 & 0x80
                assert (e16 >> 8) == ((ref >> 16) & 0xFF)
                assert (e16 & 0x7F) == 0  # root reset
            else:
                assert (e16 & 0x80) == 0
                assert (e16 >> 8) == 0  # OR-able slot accumulation
                assert (e16 & 0x7F) == (ref & STATE_MASK)


def test_pack_quad_table_post_state(paper1):
    # compact chunked entries store the post-chunk state (round 4):
    # walk every (state, b0, b1) against the raw DFA and check the
    # 16-bit entry's emit/sym/post/pos fields
    dfa = build_lane_dfa(paper1.cd.tree)
    tabq, C0, C1, NS = pack_quad_tables(dfa)
    n_states = dfa.entry.shape[0] // 2
    assert NS == 1
    C = (C0, C1)
    for st in range(n_states):
        for b0 in (0, 1):
            word = int(np.asarray(tabq)[b0, st]) & 0xFFFFFFFF
            for b1 in (0, 1):
                e16 = (word >> (16 * b1)) & 0xFFFF
                e0 = int(dfa.entry[2 * st + b0])
                if e0 & EMIT_BIT:  # emission on the chunk's first bit
                    assert e16 & 0x80
                    assert (e16 >> 8) == ((e0 >> 16) & 0xFF)
                    assert (e16 & 0x7F) == C[b1]  # post = root child of b1
                else:
                    s1 = e0 & STATE_MASK
                    e1 = int(dfa.entry[2 * s1 + b1])
                    if e1 & EMIT_BIT:  # emission on the second bit
                        assert e16 & 0x80
                        assert (e16 >> 8) == ((e1 >> 16) & 0xFF)
                        assert (e16 & 0x7F) == 0  # post = root
                    else:
                        assert (e16 & 0x80) == 0
                        assert (e16 >> 8) == 0  # OR-able slot accumulation
                        assert (e16 & 0x7F) == (e1 & STATE_MASK)


def test_word_staging_layout():
    # payload_lane_words + words_matrix_device reproduce the strided
    # lane/halo bit layout: bit j of lane g = stream bit g*B + j, zeros
    # past the stream end, halo rows = the next lane's first bits
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    payload = rng.integers(0, 256, 400, dtype=np.uint8)
    bits = 400 * 8 - 5
    G, B, steps_p = 1024, 32, 64
    w2 = payload_lane_words(payload, bits, G, B)
    assert w2.shape == (G, B // 32) and w2.dtype == np.int32
    mat = np.asarray(words_matrix_device(jnp.asarray(w2), steps_p // 32))
    assert mat.shape == (steps_p // 32, G // 128, 128)
    flat = unpack_bits(payload, bits)

    def bit_at(j, lane):
        word = int(mat[j // 32, lane // 128, lane % 128]) & 0xFFFFFFFF
        return (word >> (j % 32)) & 1

    for (j, lane) in [(0, 0), (5, 3), (31, 7), (63, 2), (40, bits // B)]:
        pos = lane * B + j  # rows >= B read the next lane's start (halo)
        want = int(flat[pos]) if pos < bits else 0
        assert bit_at(j, lane) == want
    last = G - 1  # lanes past the stream end are all zeros
    assert bit_at(0, last) == 0 and bit_at(32, last) == 0


@pytest.mark.interpret
def test_widescan_random_bytes(rng):
    raw = rng.integers(0, 256, size=9000, dtype=np.uint8)
    hf = encode_bytes(raw)
    out = decode_widescan(hf, lanes=1024, interpret=True)
    np.testing.assert_array_equal(out, raw)


@pytest.mark.interpret
def test_widescan_text_like(rng):
    # skewed alphabet -> short codes, small min depth, text-like density
    probs = np.array([0.35, 0.2, 0.12, 0.1, 0.08, 0.06, 0.05, 0.04])
    raw = rng.choice(np.arange(8, dtype=np.uint8), size=20000,
                     p=probs / probs.sum()).astype(np.uint8)
    hf = encode_bytes(raw)
    out = decode_widescan(hf, lanes=1024, interpret=True)
    np.testing.assert_array_equal(out, raw)
    # 4-KERNEL-path size check: a corrupt header must raise (the
    # one-shot path's check is covered in the default-gate routing
    # test); same stream/geometry reuses this test's compiled program
    import dataclasses

    bad = dataclasses.replace(hf, uncompressed_size=hf.uncompressed_size + 1)
    with pytest.raises(RuntimeError):
        decode_widescan(bad, lanes=1024, interpret=True, oneshot=False)


@pytest.mark.interpret
def test_widescan_paper1_prefix(paper1):
    raw = np.asarray(paper1.ucd[:24000], dtype=np.uint8)
    hf = encode_bytes(raw)
    out = decode_widescan(hf, lanes=1024, interpret=True)
    np.testing.assert_array_equal(out, raw)


def test_widescan_tiny_falls_back(hello):
    out = decode_widescan(hello.cd, interpret=True)
    np.testing.assert_array_equal(out, hello.ucd)


@pytest.mark.interpret
def test_widescan_two_symbol_alphabet(rng):
    # degenerate tree: height 1 region, min depth 1 (md=1 slot path)
    raw = (rng.random(30000) < 0.3).astype(np.uint8)
    hf = encode_bytes(raw)
    out = decode_widescan(hf, lanes=1024, interpret=True)
    np.testing.assert_array_equal(out, raw)


def test_widescan_oneshot_routing(rng):
    # the sub-2Mbit auto-route goes to the single-dispatch kernel off
    # the interpreter; under interpret it must be forced — decode both
    # ways on a tiny stream and compare
    from huffmandecoderongpus_tpu.ops import pallas_oneshot as ons
    from huffmandecoderongpus_tpu.ops.pallas_widescan import (
        stage_widescan_inputs,
    )

    # 9000 symbols: the 1500-symbol stream this test used through round 4
    # was BELOW the widescan staging envelope (4500 bits < 1024*max(H,8)),
    # so oneshot=True silently fell back and the kernel went unexercised —
    # exactly the failure mode the eligibility assert below now catches
    raw = rng.integers(0, 8, size=9000, dtype=np.uint8)
    hf = encode_bytes(raw)
    # the route must actually be live for this geometry — otherwise
    # oneshot=True would silently fall through to the 4-kernel path and
    # this (default-gate) test would stop exercising the one-shot kernel
    assert ons.oneshot_eligible(stage_widescan_inputs(hf, lanes=512))
    out = decode_widescan(hf, lanes=512, interpret=True, oneshot=True)
    np.testing.assert_array_equal(out, raw)
    # the default (oneshot=None) must NOT route under interpret: the
    # 4-kernel path is covered by every other widescan test

    # size-check coverage (was a standalone test): a corrupt header must
    # raise — same stream/geometry, so the jitted program is reused and
    # this costs one interpreted eval, not a compile
    import dataclasses

    bad = dataclasses.replace(hf, uncompressed_size=hf.uncompressed_size + 1)
    with pytest.raises(RuntimeError):
        decode_widescan(bad, lanes=512, interpret=True, oneshot=True)


@pytest.mark.interpret
def test_widescan_multi_rowgroup(rng):
    # RB < R exercises the 2D K1 grid (row-group outer dimension): the
    # per-row-group scratch must reset at each group's first segment
    import jax.numpy as jnp

    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    probs = np.array([0.35, 0.2, 0.12, 0.1, 0.08, 0.06, 0.05, 0.04])
    raw = rng.choice(np.arange(8, dtype=np.uint8), size=20000,
                     p=probs / probs.sum()).astype(np.uint8)
    hf = encode_bytes(raw)
    dfa = build_lane_dfa(hf.tree)
    H = max(dfa.height, 1)
    md = max(dfa.min_depth, 1)
    avg = hf.bits / hf.uncompressed_size
    p = ws._plan(hf.bits, H, md, lanes=1024, avg_len=avg)
    G = p["G"]
    st = ws.stage_widescan_inputs(hf, lanes=1024)
    denseT, n, total, _ = ws.wide_decode_program(
        st["words"], st["tabw"], st["lim2"], B=p["B"], H=H, G=G,
        steps=p["steps"], steps_p=p["steps_p"], SEG=p["SEG"],
        UNROLL=p["UNROLL"], md=md, Rg=p["Rg"], NG=p["NG"], ORP=p["ORP"],
        RB=2, C0=st["C0"], C1=st["C1"], NS=st["NS"], chunk2=st["chunk2"],
        interpret=True)
    assert int(total) == hf.uncompressed_size
    counts = np.asarray(n)
    mask = np.arange(p["ORP"])[None, :] < counts[:, None]
    out = np.asarray(denseT)[mask]
    np.testing.assert_array_equal(out, raw)


@pytest.mark.interpret
def test_widescan_odd_md_chunked(paper1):
    # paper1's tree has min code length 3 (odd): the 2-bit chunked
    # kernels must handle emissions split across md-slot boundaries
    # (sl0 != sl1) and mid-chunk lane entries
    from huffmandecoderongpus_tpu.ops.pallas_widescan import _plan

    raw = np.asarray(paper1.ucd[:30000], dtype=np.uint8)
    hf = encode_bytes(raw, tree=paper1.cd.tree)
    dfa = build_lane_dfa(hf.tree)
    assert dfa.min_depth == 3
    p = _plan(hf.bits, dfa.height, 3, lanes=1024,
              avg_len=hf.bits / hf.uncompressed_size)
    assert p["UNROLL"] % 2 == 0  # chunk2-eligible geometry
    out = decode_widescan(hf, lanes=1024, interpret=True)
    np.testing.assert_array_equal(out, raw)


def test_widescan_phase_locked_runs(rng):
    # adversarial self-sync case: long periodic 'abab' runs phase-lock
    # wrong-parity candidate chains, deferring merges for hundreds of
    # bits — exercises the candidate late-exit resolution and the
    # adaptive full-length fix scan in the chunked kernels
    # 2000 tiles (8000 symbols): phase-locked runs still span whole
    # lanes at this size (the p99 tail exercises late/stream-end
    # resolution), at 2/3 the round-4 interpreter cost
    base = np.tile(np.array([97, 98, 99, 100], dtype=np.uint8), 2000)
    rare = rng.integers(0, 8000, size=20)
    data = base.copy()
    data[rare] = rng.choice(np.array([101, 102], dtype=np.uint8), size=20)
    hf = encode_bytes(data)
    dfa = build_lane_dfa(hf.tree)
    assert dfa.min_depth >= 2
    # 512 lanes keep ~110 emission rows per lane, enough for merges to
    # defer across many rows while costing 1/3 the interpreter time of
    # the old 60k-symbol / 1024-lane shape
    out = decode_widescan(hf, lanes=512, interpret=True)
    np.testing.assert_array_equal(out, data)


@pytest.mark.interpret
def test_widescan_full_byte_alphabet_stays_wide(rng):
    # a full 256-symbol alphabet has 255 internal states — beyond the
    # 127-state compact table but inside the chunked *wide* layout
    # (pack_quad_tables NS=2); must NOT fall back to the round-1 decoder
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    w = rng.random(256) ** 3 + 1e-4
    raw = rng.choice(np.arange(256, dtype=np.uint8), size=60000,
                     p=w / w.sum()).astype(np.uint8)
    hf = encode_bytes(raw)
    dfa = build_lane_dfa(hf.tree)
    assert dfa.entry.shape[0] // 2 > ws.MAX_STATES
    st = ws.stage_widescan_inputs(hf, lanes=1024)  # no EnvelopeError
    assert st["NS"] >= 2 and st["chunk2"]
    out = decode_widescan(hf, lanes=1024, interpret=True)
    np.testing.assert_array_equal(out, raw)


def test_widescan_indexed(rng):
    # a .huffidx sidecar turns the index blocks into the lanes: the
    # program is main scan + compaction only (no discovery/compose/fix)
    # with exact per-lane counts from the index
    from huffmandecoderongpus_tpu.ops.pallas_widescan import (
        decode_widescan_indexed,
    )

    probs = np.array([0.35, 0.2, 0.12, 0.1, 0.08, 0.06, 0.05, 0.04])
    raw = rng.choice(np.arange(8, dtype=np.uint8), size=60000,
                     p=probs / probs.sum()).astype(np.uint8)
    hf = encode_bytes(raw, block_symbols=256)
    offsets, k = hf.index
    assert k == 256 and offsets.shape[0] == -(-raw.size // 256)
    out = decode_widescan_indexed(hf, offsets, k, interpret=True)
    np.testing.assert_array_equal(out, raw)


@pytest.mark.interpret
def test_widescan_indexed_odd_blocks(rng):
    # odd-length blocks exercise the literal-0 chunk tail (a second
    # compile geometry: nightly, the even-block case stays per-commit)
    from huffmandecoderongpus_tpu.ops.pallas_widescan import (
        decode_widescan_indexed,
    )

    probs = np.array([0.35, 0.2, 0.12, 0.1, 0.08, 0.06, 0.05, 0.04])
    raw2 = rng.choice(np.arange(8, dtype=np.uint8), size=50001,
                      p=probs / probs.sum()).astype(np.uint8)
    hf2 = encode_bytes(raw2, block_symbols=129)
    out2 = decode_widescan_indexed(hf2, *hf2.index, interpret=True)
    np.testing.assert_array_equal(out2, raw2)


@pytest.mark.interpret
def test_widescan_indexed_wide_table(rng):
    # indexed decode through the NS=2 wide-table branch (full-byte
    # alphabet, 255 internal states)
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    w = rng.random(256) ** 3 + 1e-4
    raw = rng.choice(np.arange(256, dtype=np.uint8), size=60000,
                     p=w / w.sum()).astype(np.uint8)
    hf = encode_bytes(raw, block_symbols=256)
    st = ws.stage_widescan_indexed(hf, *hf.index)
    assert st["NS"] >= 2
    out = ws.decode_widescan_indexed(hf, *hf.index, interpret=True)
    np.testing.assert_array_equal(out, raw)


@pytest.mark.interpret
def test_widescan_high_symbols(rng):
    # symbols >= 128 put the sign bit in the quad table's high half-word
    # (pack_quad_tables once overflowed the int32 store; corpus files are
    # ASCII so only synthetic data covers this)
    alpha = np.arange(200, 256, dtype=np.uint8)
    w = rng.random(alpha.size) ** 2
    raw = rng.choice(alpha, size=40000, p=w / w.sum()).astype(np.uint8)
    hf = encode_bytes(raw)
    out = decode_widescan(hf, lanes=1024, interpret=True)
    np.testing.assert_array_equal(out, raw)


@pytest.mark.interpret
def test_widescan_md1_phase_locked_runs(rng):
    # adversarial md=1 self-sync (round 5): a dominant symbol gives code
    # length 1 (md=1 -> the 1-bit kernels) and long periodic runs of
    # deeper symbols phase-lock wrong-parity candidate chains, deferring
    # merges — exercises the two-tier state-equality/leader machinery
    # ported to the 1-bit path (_k1_kernel), incl. follower composition
    # through the single md=1 leader
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    blocks = []
    for _ in range(20):
        blocks.append(np.full(600, 97, dtype=np.uint8))  # 'a' runs (md=1)
        blocks.append(np.tile(np.array([120, 121], dtype=np.uint8), 300))
    data = np.concatenate(blocks)
    # a few very rare symbols deepen the tree so several follower chains
    # exist beyond the one leader
    rare = rng.integers(0, data.size, size=12)
    data[rare] = (122 + np.arange(12) % 4).astype(np.uint8)
    hf = encode_bytes(data)
    dfa = build_lane_dfa(hf.tree)
    assert dfa.min_depth == 1
    st = ws.stage_widescan_inputs(hf, lanes=512)
    assert not st["chunk2"]  # the 1-bit kernel path
    out = decode_widescan(hf, lanes=512, interpret=True)
    np.testing.assert_array_equal(out, data)


@pytest.mark.interpret
def test_widescan_md1_leader_halo_publish():
    # regression (round 5): an m0-merged LEADER kept publishing the
    # main chain's physical walk past the main's exit; on md=1 trees the
    # halo's zero bits emit the 1-bit symbol every row, so a follower
    # state-matching the leader there composed a count one short and
    # inherited the 0-chain's exit offset instead of its own (exactly
    # one wrong byte at a lane boundary).  This seed reproduced it
    # deterministically before the leader -1 guard on (nz == -1).
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    rng3 = np.random.default_rng(3)
    w = np.full(256, 1.0)
    w[0] = 300.0
    raw = rng3.choice(np.arange(256, dtype=np.uint8), size=20000,
                      p=w / w.sum()).astype(np.uint8)
    hf = encode_bytes(raw)
    dfa = build_lane_dfa(hf.tree)
    assert dfa.min_depth == 1 and dfa.entry.shape[0] // 2 > ws.MAX_STATES
    out = decode_widescan(hf, lanes=512, interpret=True)
    np.testing.assert_array_equal(out, raw)


@pytest.mark.interpret
def test_widescan_md1_deep_tree_stays_wide(rng):
    # min code length 1 with >127 internal states (one dominant symbol
    # over a full byte alphabet — the adversarial/binary-ish shape): the
    # 1-bit kernels must chunk the paired table (wide entry layout, NS=2)
    # instead of falling back to the ~10x slower round-1 path.  Matches
    # the reference's shape-agnostic table build jumptableapproach.c:40-99.
    from huffmandecoderongpus_tpu.ops import pallas_widescan as ws

    w = np.full(256, 1.0)
    w[0] = 300.0  # dominant symbol -> code length 1
    raw = rng.choice(np.arange(256, dtype=np.uint8), size=60000,
                     p=w / w.sum()).astype(np.uint8)
    hf = encode_bytes(raw)
    dfa = build_lane_dfa(hf.tree)
    assert dfa.min_depth == 1
    assert dfa.entry.shape[0] // 2 > ws.MAX_STATES
    st = ws.stage_widescan_inputs(hf, lanes=1024)  # no EnvelopeError
    assert not st["chunk2"] and st["NS"] >= 2
    out = decode_widescan(hf, lanes=1024, interpret=True)
    np.testing.assert_array_equal(out, raw)


def test_pack_pair_table_wide_semantics(rng):
    # wide layout: emit<<15 | sym<<1 when emitting (root reset implied),
    # bare 15-bit state otherwise
    w = np.full(256, 1.0)
    w[0] = 300.0
    raw = rng.choice(np.arange(256, dtype=np.uint8), size=4000,
                     p=w / w.sum()).astype(np.uint8)
    hf = encode_bytes(raw)
    dfa = build_lane_dfa(hf.tree)
    n_states = dfa.entry.shape[0] // 2
    assert n_states > 127
    tabw = pack_pair_table(dfa)
    assert tabw.shape == (-(-n_states // 128), 128)
    flat = np.asarray(tabw).reshape(-1).astype(np.int64) & 0xFFFFFFFF
    for bit in (0, 1):
        for s in range(n_states):
            ref = int(dfa.entry[s * 2 + bit])
            e16 = (int(flat[s]) >> (16 * bit)) & 0xFFFF
            if ref & EMIT_BIT:
                assert e16 & 0x8000
                assert ((e16 >> 1) & 0xFF) == ((ref >> 16) & 0xFF)
            else:
                assert (e16 & 0x8000) == 0
                assert e16 == (ref & STATE_MASK)


@pytest.mark.interpret
def test_widescan_long_lanes_many_windows(rng):
    # few long lanes -> many K4 cell windows (CW ~ 6) and out-windows:
    # exercises the CW-invariant window bookkeeping (scalar-gated packs,
    # gathered wsel, q-division field shifts; round 4)
    probs = np.array([0.3, 0.2, 0.12, 0.1, 0.08, 0.06, 0.05, 0.04,
                      0.03, 0.02])
    raw = rng.choice(np.arange(10, dtype=np.uint8), size=600000,
                     p=probs / probs.sum()).astype(np.uint8)
    hf = encode_bytes(raw)
    out = decode_widescan(hf, lanes=512, interpret=True)
    np.testing.assert_array_equal(out, raw)
