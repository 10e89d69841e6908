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
  int32  version (= 1)
  int32  block_symbols (K)
  int32  n_blocks
  int32  reserved (0)
  n_blocks x int64: bit offset of symbol g*K
"""

from __future__ import annotations

import pathlib
import struct

import numpy as np

MAGIC = b"HIDX"
VERSION = 1
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


def write_index(path, offsets: np.ndarray, block_symbols: int) -> None:
    offsets = np.ascontiguousarray(offsets, dtype=">i8")
    with open(path, "wb") as f:
        f.write(_HEADER.pack(MAGIC, VERSION, int(block_symbols),
                             offsets.shape[0], 0))
    with open(path, "ab") as f:
        f.write(offsets.tobytes())


def read_index(path) -> tuple[np.ndarray, int]:
    """Returns (offsets int64 (n_blocks,), block_symbols)."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != MAGIC:
        raise ValueError(f"{path}: expected magic {MAGIC!r}, got {raw[:4]!r}")
    magic, version, k, n, _ = _HEADER.unpack_from(raw, 0)
    if version != VERSION:
        raise ValueError(f"{path}: unsupported index version {version}")
    if k < 1 or n < 0 or len(raw) < _HEADER.size + 8 * n:
        raise ValueError(f"{path}: bad index header k={k} n={n}")
    offsets = np.frombuffer(raw, dtype=">i8", count=n, offset=_HEADER.size)
    return offsets.astype(np.int64), k


def find_index(huff_path) -> tuple[np.ndarray, int] | None:
    """Load the sidecar next to a `.huff` file if one exists."""
    p = index_path(huff_path)
    if p.exists():
        return read_index(p)
    return None
