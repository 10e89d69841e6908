"""Corpus access: the reference's 8 test datasets and TestData loading.

Mirrors loadTestData (/root/reference/framework/huffdata.c:205-215): a test
dataset pairs an uncompressed ground-truth file with its ``<name>.huff``.
Two raw originals (kjv.txt, E.coli) are pruned from the reference mount
(.MISSING_LARGE_BLOBS); for those, ground truth is regenerated once by a
trusted serial decode and cached under ``.cache/``.
"""

from __future__ import annotations

import dataclasses
import os
import pathlib

import numpy as np

from huffmandecoderongpus_tpu.huffio.format import HuffFile, read_huff

REFERENCE_FILES = pathlib.Path(
    os.environ.get("HUFF_FILES_DIR", "/root/reference/files")
)
CACHE_DIR = pathlib.Path(os.environ.get("HUFF_CACHE_DIR", "/root/repo/.cache"))

#: All 8 corpora, in the reference's naming. mainrun.c:503-509 loads the first
#: five; the others exist in files/ and are exercised by our wider suites.
CORPUS_NAMES = [
    "hello",
    "paper1",
    "news",
    "book2",
    "kjv.txt",
    "E.coli",
    "bible.txt",
    "world192.txt",
]

#: The five datasets mainrun.c loads for its suites (mainrun.c:503-509).
MAINRUN_NAMES = ["hello", "paper1", "news", "book2", "kjv.txt"]


@dataclasses.dataclass
class TestData:
    """A named (compressed, uncompressed ground truth) pair
    (reference: struct TestData, huffdata.h:19-23)."""

    name: str
    cd: HuffFile
    ucd: np.ndarray  # uint8 ground-truth bytes

    def info(self) -> str:
        return (
            f"{self.name} nodes {self.cd.nodes}, bits {self.cd.bits}, "
            f"uncompressedsize {self.cd.uncompressed_size}"
        )


def huff_path(name: str) -> pathlib.Path:
    return REFERENCE_FILES / f"{name}.huff"


def raw_path(name: str) -> pathlib.Path:
    return REFERENCE_FILES / name


def has_raw(name: str) -> bool:
    return raw_path(name).exists()


def load_huff(name: str) -> HuffFile:
    return read_huff(huff_path(name))


def _cached_ground_truth(name: str) -> pathlib.Path:
    return CACHE_DIR / f"{name}.raw"


def load_ground_truth(name: str, decoder=None) -> np.ndarray:
    """Uncompressed ground-truth bytes for a corpus.

    For corpora whose raw file is present, reads it directly.  Otherwise
    decodes the shipped `.huff` once with a trusted serial decoder (the
    native C++ oracle by default) and caches the result.
    """
    p = raw_path(name)
    if p.exists():
        return np.fromfile(p, dtype=np.uint8)
    cached = _cached_ground_truth(name)
    if cached.exists():
        data = np.fromfile(cached, dtype=np.uint8)
        hf = load_huff(name)
        if data.size == hf.uncompressed_size:
            return data
    if decoder is None:
        from huffmandecoderongpus_tpu.native import simple_decode

        decoder = simple_decode
    hf = load_huff(name)
    out = decoder(hf)
    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    out.tofile(cached)
    return out


def load_test_data(name: str) -> TestData:
    """Load one corpus as a TestData pair (huffdata.c:205-215 semantics)."""
    return TestData(name=name, cd=load_huff(name), ucd=load_ground_truth(name))


def available_corpora() -> list[str]:
    return [n for n in CORPUS_NAMES if huff_path(n).exists()]
