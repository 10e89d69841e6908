"""Fuzz: corrupt containers must fail cleanly (exception), never hang or
crash — including tree corruption that would cycle the bit-walk decoders."""

import numpy as np
import pytest

from huffmandecoderongpus_tpu.huffio.encoder import encode_bytes
from huffmandecoderongpus_tpu.huffio.format import read_huff, write_huff
from huffmandecoderongpus_tpu.huffio.tree import validate_tree
from huffmandecoderongpus_tpu.models import get_decoder


def test_validate_tree_rejects_cycle():
    tree = np.array([[0, 1, 2], [0, 0, 2], [65, -1, -1]], dtype=np.int32)
    with pytest.raises(ValueError, match="twice"):
        validate_tree(tree)


def test_validate_tree_rejects_out_of_range():
    tree = np.array([[0, 1, 9], [65, -1, -1]], dtype=np.int32)
    with pytest.raises(ValueError, match="range"):
        validate_tree(tree)


def test_validate_tree_rejects_half_leaf():
    tree = np.array([[0, -1, 1], [65, -1, -1]], dtype=np.int32)
    with pytest.raises(ValueError, match="LEAF"):
        validate_tree(tree)


def test_read_huff_rejects_cyclic_tree(tmp_path, rng):
    raw = rng.integers(0, 256, 500, dtype=np.uint8)
    hf = encode_bytes(raw)
    path = tmp_path / "x.huff"
    write_huff(path, hf)
    blob = bytearray(path.read_bytes())
    # point the root's izero back at the root (offset 16 = first node's
    # izero field, big-endian int32)
    blob[17:21] = (0).to_bytes(4, "big")
    path.write_bytes(bytes(blob))
    with pytest.raises(ValueError):
        read_huff(path)


def test_random_blobs_fail_cleanly(tmp_path, rng):
    dec = get_decoder("simple")
    for i in range(30):
        blob = bytes(rng.integers(0, 256, int(rng.integers(0, 400)), dtype=np.uint8))
        path = tmp_path / f"r{i}.huff"
        path.write_bytes(b"HUFF" + blob if i % 2 else blob)
        try:
            hf = read_huff(path)
            dec(hf)  # if it parses, decoding must still terminate
        except (ValueError, RuntimeError):
            pass


def test_mutated_valid_files_fail_cleanly(tmp_path, rng):
    raw = rng.integers(0, 256, 2000, dtype=np.uint8)
    hf = encode_bytes(raw)
    path = tmp_path / "ok.huff"
    write_huff(path, hf)
    good = path.read_bytes()
    dec = get_decoder("simple")
    for i in range(40):
        blob = bytearray(good)
        for _ in range(int(rng.integers(1, 4))):
            blob[int(rng.integers(0, len(blob)))] = int(rng.integers(0, 256))
        p = tmp_path / f"m{i}.huff"
        p.write_bytes(bytes(blob))
        try:
            hf2 = read_huff(p)
            out = dec(hf2)
            assert out.size <= hf2.uncompressed_size + 8
        except (ValueError, RuntimeError):
            pass
