"""XLA persistent compilation cache.

Role parity with the reference's OpenCL kernel-binary cache
(loadKernelFromSourceAndSaveAsBinary / getKernelFromBinary,
openclapproach.c:26-225, gated by BUILD_BINARY_KERNELS/USE_BINARY_KERNELS):
compiled device programs survive process restarts, so the first-run compile
cost (~20-40s per distinct shape on TPU) is paid once per machine.
"""

from __future__ import annotations

import os
import pathlib

_DEFAULT_DIR = pathlib.Path(
    os.environ.get("HUFF_COMPILE_CACHE", "~/.cache/huffmandecoderongpus_tpu/xla")
).expanduser()

_enabled = False


def enable_compile_cache(cache_dir: str | os.PathLike | None = None) -> pathlib.Path:
    """Turn on JAX's persistent compilation cache (idempotent).

    Must be called before the first compilation to benefit it; later calls
    still help subsequent compiles.
    """
    global _enabled
    import jax

    path = pathlib.Path(cache_dir).expanduser() if cache_dir else _DEFAULT_DIR
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    # cache every program, however quick its compile
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return path


def cache_enabled() -> bool:
    return _enabled
