"""Persistent TPU session worker.

Polls /tmp/hwcmd/ for NNN.py files, execs each (in order, once) in one
shared namespace, appends stdout/stderr to /tmp/hwlog.txt.  Keeps the
relay session and jit caches alive across experiments, which this
environment's device relay strongly prefers (fresh sessions stall for
minutes; see repo memory tpu-relay-fragility).

Stop by creating /tmp/hwcmd/STOP.
"""
import io
import os
import sys
import time
import traceback

CMD_DIR = "/tmp/hwcmd"
LOG = "/tmp/hwlog.txt"

os.makedirs(CMD_DIR, exist_ok=True)


def log(msg):
    with open(LOG, "a") as f:
        f.write(msg if msg.endswith("\n") else msg + "\n")
        f.flush()


def main():
    ns = {"__name__": "hw"}
    log(f"=== hw_server start pid={os.getpid()} ===")
    import jax  # noqa: F401  (session init)
    import numpy as np  # noqa: F401

    ns["jax"] = jax
    ns["np"] = np
    log(f"jax ready: {jax.devices()}")
    done = set()
    while True:
        if os.path.exists(os.path.join(CMD_DIR, "STOP")):
            log("=== STOP ===")
            return
        todo = sorted(f for f in os.listdir(CMD_DIR)
                      if f.endswith(".py") and f not in done)
        for f in todo:
            done.add(f)
            path = os.path.join(CMD_DIR, f)
            log(f"--- exec {f} ---")
            buf = io.StringIO()
            t0 = time.time()
            old_out, old_err = sys.stdout, sys.stderr
            try:
                sys.stdout = sys.stderr = buf
                with open(path) as fh:
                    code = fh.read()
                exec(compile(code, path, "exec"), ns)
            except Exception:
                traceback.print_exc()
            finally:
                sys.stdout, sys.stderr = old_out, old_err
            log(buf.getvalue())
            log(f"--- done {f} ({time.time()-t0:.1f}s) ---")
        time.sleep(1)


if __name__ == "__main__":
    main()
