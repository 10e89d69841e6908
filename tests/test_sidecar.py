"""`.huffidx` sidecar: format round-trip, indexed decode, CLI integration."""

import numpy as np
import pytest

from huffmandecoderongpus_tpu.harness.cli import main
from huffmandecoderongpus_tpu.huffio.encoder import encode_bytes
from huffmandecoderongpus_tpu.huffio.format import read_huff, write_huff
from huffmandecoderongpus_tpu.huffio.sidecar import (
    build_block_index,
    index_path,
    read_index,
    write_index,
)
from huffmandecoderongpus_tpu.models import get_decoder
from huffmandecoderongpus_tpu.ops.lanedfa import decode_lanedfa_indexed


def test_index_roundtrip(tmp_path):
    offsets = np.array([0, 123, 4567, 89012], dtype=np.int64)
    p = tmp_path / "x.huffidx"
    payload = np.arange(64, dtype=np.uint8)
    write_index(p, offsets, 4096, bits=500, uncompressed_size=100,
                payload=payload)
    got, k, crc = read_index(p)
    assert k == 4096
    np.testing.assert_array_equal(got, offsets)
    from huffmandecoderongpus_tpu.huffio.sidecar import payload_binding

    assert crc == payload_binding(500, 100, payload)


def test_index_bad_magic(tmp_path):
    p = tmp_path / "bad.huffidx"
    p.write_bytes(b"NOPE" + b"\x00" * 32)
    with pytest.raises(ValueError, match="magic"):
        read_index(p)


def test_build_block_index():
    lens = np.array([3, 2, 5, 1, 4, 2, 2], dtype=np.int64)
    offs = build_block_index(lens, block_symbols=3)
    # symbol 0 at bit 0, symbol 3 at 3+2+5=10, symbol 6 at 10+1+4+2=17
    np.testing.assert_array_equal(offs, [0, 10, 17])


def test_encode_attaches_index(rng):
    raw = rng.integers(0, 256, size=10000, dtype=np.uint8)
    hf = encode_bytes(raw, block_symbols=1024)
    assert hf.index is not None
    offsets, k = hf.index
    assert k == 1024 and offsets.shape[0] == 10  # ceil(10000/1024)
    assert offsets[0] == 0
    out = decode_lanedfa_indexed(hf, offsets, k)
    np.testing.assert_array_equal(out, raw)


def test_indexed_decode_matches_discovery(rng):
    raw = rng.integers(0, 256, size=30000, dtype=np.uint8)
    hf = encode_bytes(raw, block_symbols=512)
    via_index = get_decoder("lane_dfa")(hf)
    hf.index = None
    via_discovery = get_decoder("lane_dfa")(hf)
    np.testing.assert_array_equal(via_index, via_discovery)
    np.testing.assert_array_equal(via_index, raw)


def test_read_huff_autoloads_sidecar(tmp_path, rng):
    raw = rng.integers(0, 256, size=5000, dtype=np.uint8)
    hf = encode_bytes(raw, block_symbols=500)
    dst = tmp_path / "x.huff"
    write_huff(dst, hf)
    write_index(index_path(dst), hf.index[0], hf.index[1], bits=hf.bits,
                uncompressed_size=hf.uncompressed_size, payload=hf.payload)
    hf2 = read_huff(dst)
    assert hf2.index is not None and hf2.index[1] == 500
    out = get_decoder("lane_dfa")(hf2)
    np.testing.assert_array_equal(out, raw)
    # and without sidecar, index is None
    hf3 = read_huff(dst, load_index=False)
    assert hf3.index is None


def test_stale_sidecar_rejected(tmp_path, rng):
    """A sidecar bound to a DIFFERENT payload must be ignored (advisor
    finding: stale index silently drove the indexed decoder)."""
    raw_a = rng.integers(0, 256, size=5000, dtype=np.uint8)
    raw_b = rng.integers(0, 256, size=5000, dtype=np.uint8)
    hf_a = encode_bytes(raw_a, block_symbols=500)
    hf_b = encode_bytes(raw_b, block_symbols=500)
    dst = tmp_path / "x.huff"
    write_huff(dst, hf_b)
    # stale index: built for payload A, sitting next to payload B
    write_index(index_path(dst), hf_a.index[0], hf_a.index[1],
                bits=hf_a.bits, uncompressed_size=hf_a.uncompressed_size,
                payload=hf_a.payload)
    hf2 = read_huff(dst)
    assert hf2.index is None
    out = get_decoder("lane_dfa")(hf2)  # discovery path, still exact
    np.testing.assert_array_equal(out, raw_b)


def test_cli_encode_with_index(tmp_path, capsys):
    src = tmp_path / "in.bin"
    raw = np.frombuffer(b"abcdefgh" * 2000, dtype=np.uint8)
    raw.tofile(src)
    dst = tmp_path / "out.huff"
    out = tmp_path / "dec.bin"
    main(["encode", str(src), str(dst), "--index", "1000"])
    assert index_path(dst).exists()
    main(["decode", str(dst), str(out), "--decoder", "lane_dfa"])
    np.testing.assert_array_equal(np.fromfile(out, dtype=np.uint8), raw)


def test_last_partial_block(rng):
    raw = rng.integers(0, 256, size=1025, dtype=np.uint8)  # 2 blocks: 1024+1
    hf = encode_bytes(raw, block_symbols=1024)
    out = decode_lanedfa_indexed(hf, *hf.index)
    np.testing.assert_array_equal(out, raw)


def test_truncated_sidecar_falls_back(tmp_path, rng):
    # a sidecar with valid magic but a short header must degrade to
    # discovery (struct.error is not a ValueError)
    import numpy as np

    from huffmandecoderongpus_tpu.huffio import encode_bytes
    from huffmandecoderongpus_tpu.huffio.format import read_huff, write_huff

    raw = rng.integers(0, 200, size=30000, dtype=np.uint8)
    hf = encode_bytes(raw)
    hp = tmp_path / "x.huff"
    write_huff(hp, hf)
    (tmp_path / "x.huffidx").write_bytes(b"HIDX\x01\x00")
    hf2 = read_huff(hp)
    assert getattr(hf2, "index", None) is None
