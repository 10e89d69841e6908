"""LSB-first bitstream packing/unpacking (host side, numpy).

The stream convention is the reference's (huffdata.c:280-288 / mainrun.c:45):
bit *p* of the stream is ``(payload[p//8] >> (p%8)) & 1``, i.e. numpy's
``bitorder="little"``.
"""

from __future__ import annotations

import numpy as np


def unpack_bits(payload: np.ndarray, bits: int) -> np.ndarray:
    """Payload bytes -> (bits,) uint8 array of 0/1, LSB-first."""
    payload = np.asarray(payload, dtype=np.uint8)
    out = np.unpackbits(payload, bitorder="little")
    return out[:bits]


def pack_bits(bitarr: np.ndarray) -> np.ndarray:
    """(bits,) array of 0/1 -> payload bytes, LSB-first (zero-padded tail)."""
    bitarr = np.asarray(bitarr, dtype=np.uint8)
    return np.packbits(bitarr, bitorder="little")


def payload_to_words_u32(payload: np.ndarray, bits: int, extra_words: int = 1) -> np.ndarray:
    """Payload bytes -> little-endian uint32 words for fixed-width window
    extraction on device.  Bit *p* of the stream is bit ``p % 32`` of
    ``words[p // 32]``.  ``extra_words`` zero words are appended so that
    reading ``words[p // 32 + 1]`` is always in bounds for p < bits."""
    payload = np.asarray(payload, dtype=np.uint8)
    nwords = (bits + 31) // 32 + extra_words
    buf = np.zeros(nwords * 4, dtype=np.uint8)
    buf[: payload.shape[0]] = payload[: min(payload.shape[0], nwords * 4)]
    return buf.view("<u4")
