"""The benchmark harness: verify once, then report the minimum of N timed runs.

Semantics parity with the reference's evaluate()
(/root/reference/framework/decodeUtil.c:30-70): one checked run (byte-compared
against ground truth, abort on mismatch), then ``REPEATS`` timed runs keeping
the minimum wall-clock seconds.  The first (verify) run participates in the
minimum exactly as in the reference — for jitted decoders it carries compile
time, which the min-of-25 policy discards naturally.

Decoders here are functional (they return fresh arrays) so there is no stale
output buffer to clear between runs; the reference's clearUnCompressedData
(decodeUtil.c:38,55) exists only because its decoders write in place.
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np

from huffmandecoderongpus_tpu.harness.timing import Timer, gb_per_s

#: Sample size for the minimum-time policy (decodeUtil.h:26).
REPEATS = 25

#: Per-decoder wall-clock budget for the timing loop, seconds.  The
#: reference runs a fixed 25 repeats (decodeUtil.c:54-64) because all its
#: decoders are sub-second; our suite spans ~1 ms (Pallas lane decoders)
#: to ~8 s (the faithful speculative pipeline on the TPU gather cliff), so
#: a fixed count would burn minutes on decoders already measured to 1%.
#: After the verify run, the repeat count is scaled down (never up) so
#: repeats * first_run <= budget, keeping every suite row bounded.
TIME_BUDGET_S = 30.0


class DecodeMismatch(RuntimeError):
    """Decoded bytes differ from ground truth (decodeUtil.c:47-52 abort)."""


def compare_uncompressed(got: np.ndarray, want: np.ndarray, max_report: int = 10,
                         out=None) -> int:
    """Byte-compare decoded output against ground truth.

    Returns the number of differing positions, reporting the first
    ``max_report`` to ``out`` (compareUnCompressedData, huffdata.c:183-203).
    A size mismatch is reported and counted as a difference.
    """
    got = np.asarray(got, dtype=np.uint8)
    want = np.asarray(want, dtype=np.uint8)
    if out is None:
        out = sys.stderr
    diffs = 0
    if got.size != want.size:
        print(f"size mismatch: got {got.size}, expected {want.size}", file=out)
        diffs += 1
    n = min(got.size, want.size)
    pos = np.nonzero(got[:n] != want[:n])[0]
    for p in pos[:max_report]:
        print(f"  diff at {int(p)}: got {int(got[p])}, expected {int(want[p])}", file=out)
    diffs += int(pos.size)
    if diffs:
        print(f"total differences: {diffs}", file=out)
    return diffs


@dataclasses.dataclass(frozen=True)
class EvalResult:
    """Outcome of one evaluate() call."""

    decoder: str
    dataset: str
    min_seconds: float
    times: tuple[float, ...]  # all timed runs, in order (run 0 = verify run)
    uncompressed_bytes: int
    compressed_bytes: int

    @property
    def min_ms(self) -> float:
        return self.min_seconds * 1e3

    @property
    def gb_per_s(self) -> float:
        """Decoded-output throughput (bytes produced per second)."""
        return gb_per_s(self.uncompressed_bytes, self.min_seconds)


def evaluate(decoder, td, withcheck: bool = True, repeats: int = REPEATS,
             param=None, budget_s: float | None = TIME_BUDGET_S) -> EvalResult:
    """Verify + min-of-``repeats`` benchmark of one decoder on one dataset
    (evaluate, decodeUtil.c:30-70).

    ``decoder`` is a models.Decoder (or any callable ``(hf, param) -> bytes``);
    ``td`` is a data.TestData.  Raises :class:`DecodeMismatch` if the checked
    run differs from ground truth.  ``budget_s`` caps the total timing-loop
    wall clock by scaling ``repeats`` down for slow decoders (never up);
    pass None for the reference's strict fixed-count behavior.
    """
    name = getattr(decoder, "name", getattr(decoder, "__name__", "decoder"))
    checks = getattr(decoder, "checks_output", True) and withcheck
    dec_budget = getattr(decoder, "suite_budget_s", None)
    if budget_s is not None and dec_budget is not None:
        # per-decoder cap (models.Decoder.suite_budget_s): a known-slow
        # cross-check decoder spends seconds, not the full default
        # budget, per suite row
        budget_s = min(budget_s, dec_budget)
    t = Timer()
    times = []

    t.start()
    out = decoder(td.cd, param)
    t.stop()
    times.append(t.seconds)

    if checks:
        if compare_uncompressed(out, td.ucd) != 0:
            raise DecodeMismatch(f"problem with: {name} on {td.name}")

    if budget_s is not None and repeats > 0:
        if times[0] > budget_s:
            # the verify run alone blew the budget (e.g. the numpy
            # reference pipeline on kjv): its time IS the sample —
            # don't pay for a second run that cannot fit either
            repeats = 0
        else:
            # budget from a post-compile run: the verify run carries
            # jit compile time and would starve fast jitted decoders
            # of samples
            t.start()
            decoder(td.cd, param)
            t.stop()
            times.append(t.seconds)
            repeats = max(0, min(repeats - 1,
                                 int(budget_s / max(times[-1], 1e-9))))

    for _ in range(repeats):
        t.start()
        decoder(td.cd, param)
        t.stop()
        times.append(t.seconds)

    return EvalResult(
        decoder=name,
        dataset=td.name,
        min_seconds=min(times),
        times=tuple(times),
        uncompressed_bytes=int(td.cd.uncompressed_size),
        compressed_bytes=int(td.cd.payload_bytes),
    )


def evalandshow(decoder, td, withcheck: bool = True, repeats: int = REPEATS,
                param=None, out=None) -> EvalResult:
    """Run evaluate() and print one result row (evalandshow, mainrun.c:412-420):
    parameterized decoders show the param column and seconds; plain decoders
    show milliseconds.  We add a GB/s column the reference lacks."""
    use_param = param if param is not None else getattr(decoder, "param", None)
    r = evaluate(decoder, td, withcheck=withcheck, repeats=repeats, param=use_param)
    name = getattr(decoder, "name", str(decoder))
    if use_param is not None:
        print(f"{name:>17} {td.name:>12}  {use_param:2d} {r.min_seconds:.9f}"
              f"   {r.gb_per_s:8.4f} GB/s", file=out)
    else:
        print(f"{name:>17} {td.name:>12}     {r.min_ms:.9f} ms"
              f"   {r.gb_per_s:8.4f} GB/s", file=out)
    return r
