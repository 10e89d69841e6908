"""Device (jnp) encoder: bit-exact parity with the host encoder."""

import numpy as np
import pytest

from huffmandecoderongpus_tpu.huffio.encoder import encode_bytes
from huffmandecoderongpus_tpu.native import simple_decode
from huffmandecoderongpus_tpu.ops.encode_ops import encode_device


@pytest.mark.parametrize("n", [1, 2, 11, 1000, 65537])
def test_device_encoder_matches_host(rng, n):
    raw = rng.integers(0, 256, size=n, dtype=np.uint8)
    dev = encode_device(raw)
    host = encode_bytes(raw)
    assert dev.bits == host.bits
    np.testing.assert_array_equal(dev.payload, host.payload)
    np.testing.assert_array_equal(simple_decode(dev), raw)


def test_device_encoder_text(hello):
    raw = hello.ucd
    dev = encode_device(raw, tree=hello.cd.tree)
    np.testing.assert_array_equal(simple_decode(dev), raw)
    # same tree => identical stream to the shipped file
    assert dev.bits == hello.cd.bits
    np.testing.assert_array_equal(dev.payload, hello.cd.payload)


def test_device_encoder_missing_symbol(hello):
    with pytest.raises(ValueError, match="no code"):
        encode_device(np.array([1, 2, 3], dtype=np.uint8), tree=hello.cd.tree)


def test_device_encoder_empty():
    with pytest.raises(ValueError, match="empty"):
        encode_device(np.zeros(0, dtype=np.uint8))
