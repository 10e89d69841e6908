"""utils/ (compile cache, debug dumps) and profiling subsystem."""

import io

import numpy as np
import pytest

from huffmandecoderongpus_tpu.harness.cli import main
from huffmandecoderongpus_tpu.harness.profiling import (
    format_report,
    profile_lanedfa,
    profile_speculative,
)
from huffmandecoderongpus_tpu.utils import enable_compile_cache
from huffmandecoderongpus_tpu.utils.debug import dump, set_debug


def test_compile_cache_enable(tmp_path):
    import jax

    p = enable_compile_cache(tmp_path / "xla-cache")
    assert p.exists()
    assert jax.config.jax_compilation_cache_dir == str(p)
    # a compile lands entries in the cache directory
    jax.jit(lambda x: x * 3)(np.arange(4.0)).block_until_ready()
    assert any(p.iterdir())


def test_debug_dump_gated(capsys):
    buf = io.StringIO()
    set_debug(False)
    dump("x", np.arange(10), out=buf)
    assert buf.getvalue() == ""
    set_debug(True)
    try:
        dump("bitsteps", np.arange(100), limit=5, out=buf)
        s = buf.getvalue()
        assert "bitsteps" in s and "(100 total)" in s
    finally:
        set_debug(None)


def test_profile_speculative_stages(hello):
    r = profile_speculative(hello.cd, reps=1)
    assert set(r) == {"decodeAllBits", "makebigtable", "index_query", "total"}
    assert all(v >= 0 for v in r.values())
    assert "ms" in format_report(r)


def test_profile_lanedfa_stages(paper1):
    r = profile_lanedfa(paper1.cd, lanes=32, reps=1)
    for k in ("candidate_scan", "compose", "main_scan", "host_compaction", "total"):
        assert k in r


def test_cli_prof_command(capsys):
    main(["prof", "hello", "lanedfa"])
    out = capsys.readouterr().out
    assert "stage breakdown" in out and "main_scan" in out
