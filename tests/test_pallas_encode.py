"""Lane-parallel Pallas encoder (ops/pallas_encode), interpreter mode.

The bar: byte-identical payloads vs the host encoder (huffio/encoder.py)
on the same tree — i.e. bit-exact .huff output — across random, skewed,
and corpus-prefix inputs, including the tiny-input fallback.
"""

import numpy as np
import pytest

from huffmandecoderongpus_tpu.huffio.encoder import encode_bytes
from huffmandecoderongpus_tpu.ops.pallas_encode import encode_pallas


def _check(raw, lanes=None):
    want = encode_bytes(raw)
    got = encode_pallas(raw, lanes=lanes, interpret=True)
    assert got.bits == want.bits
    np.testing.assert_array_equal(got.payload, want.payload)
    np.testing.assert_array_equal(got.tree, want.tree)


def test_encode_random_small_alphabet(rng):
    raw = rng.integers(0, 200, size=20000, dtype=np.uint8)
    _check(raw, lanes=128)


def test_encode_skewed(rng):
    probs = np.array([0.4, 0.2, 0.1, 0.1, 0.08, 0.06, 0.04, 0.02])
    raw = rng.choice(np.arange(8, dtype=np.uint8), size=30000,
                     p=probs / probs.sum()).astype(np.uint8)
    _check(raw, lanes=128)


def test_encode_paper1_prefix(paper1):
    raw = np.asarray(paper1.ucd[:30000], dtype=np.uint8)
    _check(raw, lanes=128)


def test_encode_tiny_stays_on_device(rng):
    # positional lane padding removed the 8192-byte device floor: tiny
    # inputs run the device kernels and still match the host encoder
    raw = rng.integers(0, 100, size=500, dtype=np.uint8)
    _check(raw)
    _check(rng.integers(0, 100, size=11, dtype=np.uint8))  # hello-sized


def test_encode_full_256_alphabet(rng):
    # a full 256-symbol alphabet leaves no free pad byte — the device
    # path must not fall back (positional masking, not a pad symbol)
    raw = np.concatenate([
        np.arange(256, dtype=np.uint8),  # force every symbol present
        rng.integers(0, 256, size=30000, dtype=np.uint8),
    ])
    assert np.unique(raw).size == 256
    _check(raw, lanes=128)


def test_encode_roundtrip_through_decoder(rng):
    probs = np.array([0.3, 0.25, 0.2, 0.15, 0.1])
    raw = rng.choice(np.arange(5, dtype=np.uint8), size=25000,
                     p=probs / probs.sum()).astype(np.uint8)
    hf = encode_pallas(raw, lanes=128, interpret=True)
    from huffmandecoderongpus_tpu.models import get_decoder

    out = get_decoder("simple")(hf)
    np.testing.assert_array_equal(out, raw)
