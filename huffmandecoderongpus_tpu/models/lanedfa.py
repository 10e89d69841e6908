"""Registry entry for the lane-parallel bit-DFA device decoder."""

from __future__ import annotations

import numpy as np

from huffmandecoderongpus_tpu.models import register
from huffmandecoderongpus_tpu.ops.lanedfa import decode_lanedfa, decode_lanedfa_indexed


@register("lane_dfa", backend="xla")
def lane_dfa(hf, param=None) -> np.ndarray:
    """Bit-serial DFA over G parallel lanes (device counterpart of
    jumptableapproach.c/linapproach.c; see ops/lanedfa.py for the TPU-shaped
    design rationale).  Uses the `.huffidx` sidecar when the HuffFile carries
    one (skipping entry discovery); ``param`` optionally sets the lane
    count for the discovery path."""
    index = getattr(hf, "index", None)
    if index is not None:
        offsets, k = index
        return decode_lanedfa_indexed(hf, offsets, k)
    return decode_lanedfa(hf, lanes=param)


@register("lane_dfa_sync", backend="xla")
def lane_dfa_sync(hf, param=None) -> np.ndarray:
    """Lane DFA with self-synchronizing entry discovery — (1+eps)x the main
    scan instead of the height-fold candidate cost (ops/lanedfa_sync.py)."""
    from huffmandecoderongpus_tpu.ops.lanedfa_sync import decode_lanedfa_sync

    return decode_lanedfa_sync(hf, lanes=param)


@register("lane_dfa_pallas", backend="pallas")
def lane_dfa_pallas(hf, param=None) -> np.ndarray:
    """Mosaic-kernel lane DFA: table lookups ride tpu.dynamic_gather
    (ops/pallas_lanedfa.py).  Falls back to the interpreter off-TPU."""
    import jax

    from huffmandecoderongpus_tpu.ops.pallas_lanedfa import decode_lanedfa_pallas

    interpret = jax.default_backend() not in ("tpu",)
    return decode_lanedfa_pallas(hf, lanes=param, interpret=interpret)
