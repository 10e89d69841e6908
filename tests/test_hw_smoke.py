"""Gated real-hardware smoke for the Pallas kernels (one corpus, one tile
budget).

The per-commit suite runs every kernel in interpret mode on CPU
(conftest.py forces ``jax_platforms=cpu``); Mosaic *lowering* regressions
therefore only surface on real hardware.  This test closes that gap: with
``RUN_HW=1`` it spawns a fresh Python (so the environment's device plugin,
not the conftest override, picks the backend) and decodes paper1 through
the two Pallas decoders, bit-exact, failing if either kernel stops
compiling or mis-executes on the chip.

Kept tiny (paper1, default plans) so a relay round-trip budget of minutes
suffices; the full-corpus sweep stays in scripts/hw_widescan.py / bench.py.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_HW"),
    reason="real-TPU smoke; set RUN_HW=1 (needs the device relay)")

_PROG = r"""
import numpy as np
import jax
assert jax.devices()[0].platform == "tpu", jax.devices()
from huffmandecoderongpus_tpu import data
from huffmandecoderongpus_tpu.ops.pallas_widescan import decode_widescan
from huffmandecoderongpus_tpu.ops.pallas_lanedfa import decode_lanedfa_pallas

from huffmandecoderongpus_tpu.ops import pallas_oneshot as ons
from huffmandecoderongpus_tpu.ops import pallas_widescan as ws0

td = data.load_test_data("paper1")
# paper1 is sub-ONESHOT_MAX_BITS: the default decode_widescan call on
# hardware ROUTES to the single-dispatch one-shot kernel — assert the
# route is live so this smoke actually covers that kernel on the chip
# (round 5; previously only "paper1 decoded" was checked)
assert td.cd.bits < ws0.ONESHOT_MAX_BITS
assert ons.oneshot_eligible(ws0.stage_widescan_inputs(td.cd)), (
    "paper1 fell out of the one-shot envelope; smoke no longer covers "
    "the routed kernel")
out = decode_widescan(td.cd)
assert np.array_equal(out, td.ucd), "widescan mismatch on hardware"
print("widescan OK (one-shot routed)", flush=True)
out = decode_lanedfa_pallas(td.cd)
assert np.array_equal(out, td.ucd), "lanedfa_pallas mismatch on hardware"
print("lanedfa_pallas OK", flush=True)

# wide-table envelope: a full-byte alphabet (NS=2 chunked tables, wide
# entry layout) must stay on the widescan path and stay bit-exact
from huffmandecoderongpus_tpu.huffio.encoder import encode_bytes
from huffmandecoderongpus_tpu.ops import pallas_widescan as ws
rng = np.random.default_rng(3)
w = rng.random(256) ** 4 + 1e-5
raw = rng.choice(np.arange(256, dtype=np.uint8), size=400_000,
                 p=w / w.sum()).astype(np.uint8)
hf = encode_bytes(raw)
st = ws.stage_widescan_inputs(hf)
assert st["NS"] >= 2, "expected the wide-table path"
out = ws.decode_widescan(hf)
assert np.array_equal(out, raw), "wide-table widescan mismatch on hardware"
print("widescan wide-table OK", flush=True)

# md=1 deep tree (round 3): one dominant symbol over a full byte
# alphabet exercises the wide 1-bit paired-table path (NS=2, chunk2 off)
w1 = np.full(256, 1.0); w1[0] = 300.0
raw1 = rng.choice(np.arange(256, dtype=np.uint8), size=400_000,
                  p=w1 / w1.sum()).astype(np.uint8)
hf1 = encode_bytes(raw1)
st1 = ws.stage_widescan_inputs(hf1, lanes=2048)
assert not st1["chunk2"] and st1["NS"] >= 2, "expected the wide 1-bit path"
out1 = ws.decode_widescan(hf1, lanes=2048)
assert np.array_equal(out1, raw1), "md=1 deep widescan mismatch on hardware"
print("widescan md1-deep OK", flush=True)

# one-shot envelope edge (round 5): the largest oneshot_eligible
# geometry must COMPILE within scoped VMEM on the chip — an undercount
# in the hand-summed VMEM word model (oneshot_eligible) becomes a
# Mosaic OOM here, the failure class the CPU gate cannot see.  Same
# construction as tests/test_oneshot.py::largest_oneshot_stream.
probs = np.array([0.35, 0.2, 0.12, 0.1, 0.08, 0.06, 0.05, 0.04])
redge = np.random.default_rng(0)
raw_full = redge.choice(np.arange(8, dtype=np.uint8), size=1 << 20,
                        p=probs / probs.sum()).astype(np.uint8)
best = None
for size in range(1 << 16, 1 << 20, 1 << 16):
    rawe = raw_full[:size]
    hfe2 = encode_bytes(rawe)
    if hfe2.bits >= ws.ONESHOT_MAX_BITS:
        break
    ste = ws.stage_widescan_inputs(hfe2)
    if ons.oneshot_eligible(ste):
        best = (rawe, hfe2, ste)
assert best is not None
rawe, hfe2, ste = best
oute = ons.decode_oneshot_staged(hfe2, ste)
assert np.array_equal(oute, rawe), "one-shot envelope-edge mismatch"
print("oneshot envelope-edge OK", flush=True)

# batched multi-stream decode (round 5): two synthetic streams with
# distinct trees through ONE device program, bit-exact on the chip
from huffmandecoderongpus_tpu.ops.pallas_batch import decode_widescan_batch
rb = np.random.default_rng(5)
wb1 = rb.random(8) * 3 + 1
rawb1 = rb.choice(np.arange(8, dtype=np.uint8), size=40_000,
                  p=wb1 / wb1.sum()).astype(np.uint8)
rawb2 = rb.choice(np.arange(16, dtype=np.uint8), size=60_000).astype(np.uint8)
houts = decode_widescan_batch([encode_bytes(rawb1), encode_bytes(rawb2)])
assert np.array_equal(houts[0], rawb1) and np.array_equal(houts[1], rawb2), \
    "batched decode mismatch on hardware"
print("batched decode OK", flush=True)

# device encoder (round 3 envelope): full 256-symbol alphabet +
# device E3 placement, byte-identical to the host encoder
from huffmandecoderongpus_tpu.ops.pallas_encode import encode_pallas
raw2 = np.concatenate([np.arange(256, dtype=np.uint8),
                       rng.integers(0, 256, size=200_000, dtype=np.uint8)])
hfe = encode_pallas(raw2, interpret=False)
want = encode_bytes(raw2, tree=hfe.tree)
assert hfe.bits == want.bits and np.array_equal(hfe.payload, want.payload)
print("encode_pallas full-alphabet OK", flush=True)
"""


def _run_on_hw(prog: str, timeout_env: str, default_s: str):
    # fresh env minus any CPU overrides the test harness may have set, so
    # the environment's own device plugin selects the real backend
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    return subprocess.run(
        [sys.executable, "-c", prog], env=env, capture_output=True,
        text=True, timeout=int(os.environ.get(timeout_env, default_s)),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_pallas_kernels_on_hardware():
    proc = _run_on_hw(_PROG, "RUN_HW_TIMEOUT_S", "600")
    assert proc.returncode == 0, (
        f"hardware smoke failed\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-3000:]}")
    assert "widescan OK (one-shot routed)" in proc.stdout
    assert "lanedfa_pallas OK" in proc.stdout
    assert "widescan wide-table OK" in proc.stdout
    assert "widescan md1-deep OK" in proc.stdout
    assert "oneshot envelope-edge OK" in proc.stdout
    assert "batched decode OK" in proc.stdout
    assert "encode_pallas full-alphabet OK" in proc.stdout


_PROG_ALL = r"""
import time
import numpy as np
import jax
assert jax.devices()[0].platform == "tpu", jax.devices()
from huffmandecoderongpus_tpu import data
from huffmandecoderongpus_tpu.ops.pallas_widescan import decode_widescan

t0 = time.monotonic()
for name in data.available_corpora():
    td = data.load_test_data(name)
    out = decode_widescan(td.cd)
    assert np.array_equal(out, td.ucd), f"lane_wide mismatch on {name}"
    print(f"lane_wide {name} OK ({time.monotonic() - t0:.0f}s)", flush=True)
print("lane_wide all-corpora OK", flush=True)
"""


def test_lane_wide_all_corpora_on_hardware():
    """The flagship decoder decodes all 8 shipped corpora bit-exact on the
    real chip — the committed version of what was a manual HW event in
    round 2 (reference checks every benchmarked decoder on every suite
    run, decodeUtil.c:47-52).  Budget: one compile per distinct plan
    geometry + 8 decodes; minutes on the relay."""
    proc = _run_on_hw(_PROG_ALL, "RUN_HW_ALL_TIMEOUT_S", "1200")
    assert proc.returncode == 0, (
        f"hardware corpus sweep failed\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-3000:]}")
    assert "lane_wide all-corpora OK" in proc.stdout
