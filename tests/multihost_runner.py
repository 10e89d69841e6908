"""Standalone worker for the 2-process multi-host decode test.

Launched by tests/test_multihost.py as:
    python tests/multihost_runner.py <coordinator> <num_procs> <pid> <corpus>

Each process forces the CPU backend with 2 local virtual devices, joins the
jax.distributed job, decodes the corpus over the global 4-device mesh, and
prints OK:<sha> of the decoded bytes for the parent to compare.
"""

import hashlib
import os
import sys

# Python puts this script's directory (tests/) on sys.path, not the repo
# root; make the package importable even when it isn't pip-installed.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    coordinator, num, pid, name = sys.argv[1:5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=int(num), process_id=int(pid))
    assert jax.process_count() == int(num)
    assert len(jax.devices()) == 2 * int(num)

    from huffmandecoderongpus_tpu import data
    from huffmandecoderongpus_tpu.parallel.multihost import (
        decode_sharded_multihost, global_mesh)

    td = data.load_test_data(name)
    out = decode_sharded_multihost(td.cd, mesh=global_mesh())
    digest = hashlib.sha256(out.tobytes()).hexdigest()
    want = hashlib.sha256(td.ucd.tobytes()).hexdigest()
    status = "OK" if digest == want else "MISMATCH"
    print(f"{status}:{pid}:{digest}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
