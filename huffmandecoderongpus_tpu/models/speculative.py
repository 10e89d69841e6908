"""Registry entries for the speculative parallel pipeline backends.

The reference implements this algorithm once per backend (pes/fastgpu/
fastgpuOpt1/opencl/pacc).  Here the *same* jitted program runs on any XLA
backend — the TPU entry is the metric path; the CPU entry plays the role the
pes/pacc builds play (same semantics, host execution)."""

from __future__ import annotations

import jax
import numpy as np

from huffmandecoderongpus_tpu.models import register
from huffmandecoderongpus_tpu.ops.speculative import (
    decode_xla,
    speculative_decode_numpy,
)


@register("pes_numpy", backend="numpy")
def pes_numpy(hf, param=None) -> np.ndarray:
    """Vectorized host execution of the 6-stage pipeline (pes.c:106-209 role)."""
    return speculative_decode_numpy(hf)


@register("spec_xla", backend="xla", suite_budget_s=5.0)
def spec_xla(hf, param=None) -> np.ndarray:
    """Single-device XLA pipeline on the default backend (fastgpu.cu role).
    Timed calls include H2D/D2H transfer, matching the reference's
    whole-approach timing.

    Suite budget 5 s: on TPU this decoder sits on the measured gather
    cliff (DESIGN.md — ~6.5 s on kjv) and is kept in the suites as the
    reference-shaped contrast row, not a contender; the cap keeps
    ``bigtable`` on TPU to minutes instead of 30 s/corpus on a decoder
    known to be hopeless there (mainrun.c:541-588 suite ergonomics)."""
    return decode_xla(hf)


@register("spec_sharded", backend="xla-sharded")
def spec_sharded(hf, param=None) -> np.ndarray:
    """Block-parallel decode over a device mesh (no reference counterpart —
    the inter-device axis SURVEY §2.3 requires).  ``param`` optionally caps
    the number of mesh devices."""
    from huffmandecoderongpus_tpu.parallel import decode_sharded, make_mesh

    mesh = make_mesh(param) if param is not None else None
    return decode_sharded(hf, mesh=mesh)


@register("lane_sharded_wide", backend="pallas-sharded")
def lane_sharded_wide(hf, param=None) -> np.ndarray:
    """Widescan decode sharded over the mesh's lane axis
    (parallel/lane_sharded.py::decode_lane_sharded_wide) — the round-2
    multi-chip performance path: per-shard fused chunked scans + dense
    compaction, stitched by one exit-map all_gather."""
    from huffmandecoderongpus_tpu.parallel import (
        decode_lane_sharded_wide, make_mesh)

    mesh = make_mesh(int(param)) if param else make_mesh()
    return decode_lane_sharded_wide(hf, mesh=mesh)


@register("lane_sharded", backend="xla-sharded")
def lane_sharded(hf, param=None) -> np.ndarray:
    """Lane-DFA decode with lanes sharded over the device mesh
    (parallel/lane_sharded.py) — the performance multi-chip path."""
    from huffmandecoderongpus_tpu.parallel import decode_lane_sharded, make_mesh

    mesh = make_mesh(param) if param is not None else None
    return decode_lane_sharded(hf, mesh=mesh)


@register("spec_xla_cpu", backend="xla-cpu")
def spec_xla_cpu(hf, param=None) -> np.ndarray:
    """Same compiled program pinned to the host CPU backend (the pes/pacc
    'same algorithm, different backend' role)."""
    with jax.default_device(jax.devices("cpu")[0]):
        return decode_xla(hf)
