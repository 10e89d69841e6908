"""Device compute ops: LUT construction, bit-window extraction, and the
6-stage speculative parallel-decode pipeline (jnp/XLA and Pallas variants)."""

from huffmandecoderongpus_tpu.ops.lut import DecodeLUT, build_decode_lut
from huffmandecoderongpus_tpu.ops.speculative import (
    SpecPlan,
    make_plan,
    decode_device_arrays,
    speculative_decode_xla,
)

__all__ = [
    "DecodeLUT",
    "build_decode_lut",
    "SpecPlan",
    "make_plan",
    "decode_device_arrays",
    "speculative_decode_xla",
]
