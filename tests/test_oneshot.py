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
