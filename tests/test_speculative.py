"""The 6-stage speculative pipeline: XLA and numpy variants vs oracles."""

import numpy as np
import pytest

from huffmandecoderongpus_tpu import data as corpus_data
from huffmandecoderongpus_tpu import native
from huffmandecoderongpus_tpu.huffio import encode_bytes
from huffmandecoderongpus_tpu.ops.lut import build_decode_lut
from huffmandecoderongpus_tpu.ops.speculative import (
    decode_xla,
    make_plan,
    speculative_decode_numpy,
)

SMALL = ["hello", "paper1", "news", "book2"]
BIG = ["kjv.txt", "E.coli", "bible.txt", "world192.txt"]


def test_lut_hello():
    hf = corpus_data.load_huff("hello")
    lut = build_decode_lut(hf.tree)
    assert lut.height == 4
    assert lut.sym.size == 16
    # every window decodes to a leaf with a plausible length
    assert (lut.length >= 1).all() and (lut.length <= 4).all()


def test_plan_levels():
    assert make_plan(32, 11, 4).levels == 4
    assert make_plan(10, 1, 2).levels == 0
    assert make_plan(10, 2, 2).levels == 1
    assert make_plan(24585561, 5504597, 19).levels == 23


@pytest.mark.parametrize("name", [
    "hello", "paper1",
    # news/book2 cost 10-25s of host numpy each for the same code path:
    # nightly only
    pytest.param("news", marks=pytest.mark.slow),
    pytest.param("book2", marks=pytest.mark.slow)])
def test_numpy_pipeline_matches_ground_truth(name):
    td = corpus_data.load_test_data(name)
    out = speculative_decode_numpy(td.cd)
    assert (out == td.ucd).all()


@pytest.mark.parametrize("name", SMALL)
def test_xla_pipeline_matches_ground_truth(name):
    td = corpus_data.load_test_data(name)
    out = decode_xla(td.cd)
    assert out.dtype == np.uint8
    assert (out == td.ucd).all()


@pytest.mark.slow
@pytest.mark.parametrize("name", BIG)
def test_xla_pipeline_big_corpora(name):
    td = corpus_data.load_test_data(name)
    out = decode_xla(td.cd)
    assert (out == td.ucd).all()


def test_xla_roundtrip_random_skewed(rng):
    probs = np.arange(1, 33, dtype=np.float64) ** 3
    data = rng.choice(np.arange(32, dtype=np.uint8), size=65_537, p=probs / probs.sum())
    hf = encode_bytes(data)
    assert (decode_xla(hf) == data).all()
    assert (speculative_decode_numpy(hf) == data).all()


def test_xla_tiny_inputs():
    for payload in [b"a", b"ab", b"aab", b"x" * 7]:
        hf = encode_bytes(payload)
        assert bytes(decode_xla(hf)) == payload


def test_detects_corrupt_stream():
    td = corpus_data.load_test_data("hello")
    hf = td.cd
    hf.payload[1] ^= 0x04  # flip a mid-stream bit (bit 10 of 32)
    try:
        out = decode_xla(hf)
        assert not (out == td.ucd).all()
    except RuntimeError:
        pass  # size-mismatch detection is also acceptable
    finally:
        hf.payload[1] ^= 0x04
