"""`.huffidx` block-index sidecar: encode-time symbol-aligned block offsets.

New capability (the reference has no encoder, hence no index; SURVEY §7.4
anticipates exactly this extension: "split the bitstream into independent
blocks at encode time (symbol-aligned block index — an extension the format
permits as a sidecar)").  The `.huff` container itself stays byte-exact; the
index travels in a sibling file ``<name>.huffidx``.

With an index, a parallel decoder needs no entry discovery: block g starts
at a known bit offset on a codeword boundary and holds exactly
``block_symbols`` symbols (the last block may hold fewer), so decoded lanes
concatenate by reshape — no compaction pass.

Layout (all ints big-endian, matching the container's convention,
huffdata.c:21-25):

  magic  b"HIDX"
  int32  version (= 2)
  int32  block_symbols (K)
  int32  n_blocks
  int32  binding crc32 over (bits BE, uncompressedsize BE, payload)
  n_blocks x int64: bit offset of symbol g*K

The binding crc ties the index to one specific payload: a stale or
copied sidecar (advisor finding, round 1) fails verification on load and
the decoder falls back to on-device entry discovery instead of silently
trusting mismatched offsets.  Version-1 files (no binding) are likewise
ignored.
"""

from __future__ import annotations

import pathlib
import struct

import numpy as np

MAGIC = b"HIDX"
VERSION = 2
_HEADER = struct.Struct(">4siiii")
DEFAULT_BLOCK_SYMBOLS = 4096


def index_path(huff_path) -> pathlib.Path:
    return pathlib.Path(str(huff_path) + "idx")  # foo.huff -> foo.huffidx


def build_block_index(code_lengths_per_symbol: np.ndarray,
                      block_symbols: int = DEFAULT_BLOCK_SYMBOLS) -> np.ndarray:
    """Bit offsets of symbols 0, K, 2K, ... from per-symbol code lengths."""
    lens = np.asarray(code_lengths_per_symbol, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return np.ascontiguousarray(starts[::block_symbols])


def payload_binding(bits: int, uncompressed_size: int,
                    payload: np.ndarray) -> int:
    """crc32 binding an index to one (bits, size, payload) triple."""
    import struct as _struct
    import zlib

    head = _struct.pack(">ii", int(bits), int(uncompressed_size))
    return zlib.crc32(np.ascontiguousarray(payload, dtype=np.uint8).tobytes(),
                      zlib.crc32(head)) & 0x7FFFFFFF


def write_index(path, offsets: np.ndarray, block_symbols: int, *,
                bits: int, uncompressed_size: int,
                payload: np.ndarray) -> None:
    offsets = np.ascontiguousarray(offsets, dtype=">i8")
    crc = payload_binding(bits, uncompressed_size, payload)
    with open(path, "wb") as f:
        f.write(_HEADER.pack(MAGIC, VERSION, int(block_symbols),
                             offsets.shape[0], crc))
    with open(path, "ab") as f:
        f.write(offsets.tobytes())


def read_index(path) -> tuple[np.ndarray, int, int]:
    """Returns (offsets int64 (n_blocks,), block_symbols, binding_crc)."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != MAGIC:
        raise ValueError(f"{path}: expected magic {MAGIC!r}, got {raw[:4]!r}")
    magic, version, k, n, crc = _HEADER.unpack_from(raw, 0)
    if version != VERSION:
        raise ValueError(f"{path}: unsupported index version {version}")
    if k < 1 or n < 0 or len(raw) < _HEADER.size + 8 * n:
        raise ValueError(f"{path}: bad index header k={k} n={n}")
    offsets = np.frombuffer(raw, dtype=">i8", count=n, offset=_HEADER.size)
    return offsets.astype(np.int64), k, crc


def find_index(huff_path, *, bits: int | None = None,
               uncompressed_size: int | None = None,
               payload: np.ndarray | None = None
               ) -> tuple[np.ndarray, int] | None:
    """Load and VERIFY the sidecar next to a `.huff` file.

    Returns None (decoder falls back to discovery) when there is no
    sidecar, it has an old/unknown version, or its binding crc does not
    match the payload it sits next to."""
    p = index_path(huff_path)
    if not p.exists():
        return None
    try:
        offsets, k, crc = read_index(p)
    except (ValueError, struct.error, OSError):
        # truncated/corrupt/unreadable sidecar: degrade to discovery
        return None
    if payload is not None:
        want = payload_binding(bits, uncompressed_size, payload)
        if crc != want:
            return None
    return offsets, k
