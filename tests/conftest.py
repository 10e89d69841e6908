"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

Must run before the first `import jax` anywhere in the test process.
"""

import os

# Force CPU: the benchmark environment points JAX at the real TPU (a PJRT
# plugin registered by a sitecustomize hook that *also* sets the jax_platforms
# config var, shadowing any JAX_PLATFORMS we export).  Running the test
# matrix's many small compiles over the device tunnel is painfully slow, so
# override the config var directly before any backend initializes.  Tests
# exercise program *semantics*; the real chip is covered by bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from huffmandecoderongpus_tpu import data as corpus_data  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute big-corpus tests (run with RUN_SLOW=1)"
    )
    config.addinivalue_line(
        "markers",
        "interpret: interpreter-heavy Mosaic kernel tests (>30s each; run "
        "with RUN_SLOW=1 — the default gate keeps one cheap case per path)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow; set RUN_SLOW=1 to run")
    skip_i = pytest.mark.skip(
        reason="interpreter-heavy; set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
        elif "interpret" in item.keywords:
            item.add_marker(skip_i)


@pytest.fixture(scope="session")
def hello():
    return corpus_data.load_test_data("hello")


@pytest.fixture(scope="session")
def paper1():
    return corpus_data.load_test_data("paper1")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def small_corpora():
    return [n for n in ["hello", "paper1", "news", "book2"] if corpus_data.huff_path(n).exists()]
