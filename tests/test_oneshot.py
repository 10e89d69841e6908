"""Single-dispatch one-shot decoder (ops/pallas_oneshot), interpreter mode.

Covers the in-kernel 3-pass composition (nonzero entry offsets), the
in-place fix splice, odd min-depth slot splitting, and the
decode_widescan routing for VMEM-sized streams.
"""

import numpy as np
import pytest

from huffmandecoderongpus_tpu.huffio.encoder import encode_bytes
from huffmandecoderongpus_tpu.ops import pallas_oneshot as ons
from huffmandecoderongpus_tpu.ops import pallas_widescan as ws


@pytest.mark.interpret
def test_oneshot_text_like(rng):
    probs = np.array([0.35, 0.2, 0.12, 0.1, 0.08, 0.06, 0.05, 0.04])
    raw = rng.choice(np.arange(8, dtype=np.uint8), size=20000,
                     p=probs / probs.sum()).astype(np.uint8)
    hf = encode_bytes(raw)
    st = ws.stage_widescan_inputs(hf, lanes=1024)
    assert ons.oneshot_eligible(st)
    out = ons.decode_oneshot(hf, lanes=1024, interpret=True)
    np.testing.assert_array_equal(out, raw)


@pytest.mark.interpret
def test_oneshot_odd_md(paper1):
    # paper1's tree has min code length 3: odd-md slot splitting inside
    # the fused kernel's main and fix phases
    raw = np.asarray(paper1.ucd[:24000], dtype=np.uint8)
    hf = encode_bytes(raw, tree=paper1.cd.tree)
    out = ons.decode_oneshot(hf, lanes=1024, interpret=True)
    np.testing.assert_array_equal(out, raw)


def test_oneshot_envelope_rejects_md1(rng):
    raw = (rng.random(30000) < 0.3).astype(np.uint8)
    hf = encode_bytes(raw)
    with pytest.raises(ws.EnvelopeError):
        ons.decode_oneshot(hf, lanes=1024, interpret=True)


@pytest.mark.interpret
def test_oneshot_wide_table_ns2(rng):
    # NS=2 wide-table one-shot (round 5): a full-byte alphabet tree
    # (255 internal states) through the single-dispatch kernel — the
    # _quad_word NS>1 chunk-select path inside the fused kernel
    w = rng.random(256) ** 3 + 1e-4
    raw = rng.choice(np.arange(256, dtype=np.uint8), size=24000,
                     p=w / w.sum()).astype(np.uint8)
    hf = encode_bytes(raw)
    st = ws.stage_widescan_inputs(hf, lanes=1024)
    assert st["NS"] >= 2 and st["chunk2"]
    assert ons.oneshot_eligible(st)
    out = ons.decode_oneshot_staged(hf, st, interpret=True)
    np.testing.assert_array_equal(out, raw)


@pytest.mark.interpret
def test_oneshot_orp_overflow_falls_through(rng, monkeypatch):
    # a lane overflowing the dense buffer must raise EnvelopeError from
    # decode_oneshot_staged, and decode_widescan's router must then fall
    # through (one-shot -> 4-kernel -> round-1 fallback) and still return
    # exact bytes.  The stream needs a lane holding > 128 symbols (ORP is
    # 128-granular, so smaller counts cannot overflow any legal buffer):
    # a contiguous run of the 2-bit-coded dominant symbol packs ~B/2
    # symbols into its lanes while ORP (sized on the stream mean) stays
    # a window below; the clamp pins ORP one window under that run.
    parts = [np.full(15000, 0, dtype=np.uint8),
             rng.integers(1, 8, size=45000, dtype=np.uint8)]
    raw = np.concatenate(parts)
    hf = encode_bytes(raw)
    real_stage = ws.stage_widescan_inputs
    calls = {}

    def clamped_stage(hf_, lanes=None):
        st = real_stage(hf_, lanes=lanes)
        st["plan"]["ORP"] = 128  # < max per-lane count for this stream
        return st

    st = clamped_stage(hf, lanes=512)
    assert ons.oneshot_eligible(st)
    with pytest.raises(ws.EnvelopeError, match="overflowed"):
        ons.decode_oneshot_staged(hf, st, interpret=True)

    real_staged_decode = ons.decode_oneshot_staged

    def recording_decode(hf_, st_, **kw):
        try:
            return real_staged_decode(hf_, st_, **kw)
        except ws.EnvelopeError:
            calls["oneshot_raised"] = True
            raise

    monkeypatch.setattr(ws, "stage_widescan_inputs", clamped_stage)
    monkeypatch.setattr(ons, "decode_oneshot_staged", recording_decode)
    out = ws.decode_widescan(hf, lanes=512, interpret=True, oneshot=True)
    assert calls.get("oneshot_raised"), (
        "router never reached the one-shot kernel")
    np.testing.assert_array_equal(out, raw)


def largest_oneshot_stream(rng, max_bits=ws.ONESHOT_MAX_BITS):
    """Largest text-like stream (in 64 KB steps) still inside the
    one-shot VMEM envelope — shared with the RUN_HW smoke, which compiles
    the same geometry on the chip to pin the hand-summed VMEM word model
    (oneshot_eligible) against the Mosaic compiler's actual scoped-VMEM
    accounting."""
    probs = np.array([0.35, 0.2, 0.12, 0.1, 0.08, 0.06, 0.05, 0.04])
    raw_full = rng.choice(np.arange(8, dtype=np.uint8), size=1 << 20,
                          p=probs / probs.sum()).astype(np.uint8)
    best = None
    for size in range(1 << 16, 1 << 20, 1 << 16):
        raw = raw_full[:size]
        hf = encode_bytes(raw)
        if hf.bits >= max_bits:
            break
        st = ws.stage_widescan_inputs(hf)
        if ons.oneshot_eligible(st):
            best = (raw, hf, st)
    assert best is not None
    return best


@pytest.mark.interpret
def test_oneshot_envelope_edge(rng):
    # the largest eligible geometry must decode exactly (interpret);
    # RUN_HW compiles the same construction on the chip, where an
    # undercounting VMEM model becomes a Mosaic OOM (the failure class
    # the CPU gate cannot see)
    raw, hf, st = largest_oneshot_stream(rng)
    assert hf.bits > 1 << 20  # sanity: a non-toy, >1 Mbit stream
    out = ons.decode_oneshot_staged(hf, st, interpret=True)
    np.testing.assert_array_equal(out, raw)
