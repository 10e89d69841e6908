"""Shared relay-safe timing helpers for the scripts/hw_* harnesses.

Canonical implementation of the round-4 estimator (see DESIGN.md
hardware facts): interleaved two-batch differencing
t = (T(3K) - T(K)) / 2K cancels the relay's 23-36 ms per-fence
round-trip exactly; interleaving makes session drift hit both sides
equally; enough trials converge each side's min round-trip draw
(25 trials ~ ±0.02 ms; at 7 the residual was ±0.15 ms).  Batches stay
<= 30 dispatches per fence — longer unfenced queues have wedged the
relay.
"""
import time

import numpy as np


def floor_s(reps=10):
    """Relay round-trip floor: trivial jitted program + 1-element readback."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(8, jnp.int32)
    np.asarray(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(x))[0]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timeit(fn, fence, K=10, trials=25):
    """Per-run seconds of ``fn`` via interleaved two-batch differencing.

    ``fence(out)`` must select a value data-dependent on the whole
    program (a 1-element readback brackets execution; this relay's
    block_until_ready can return early).  Returns (seconds, last_out).
    """
    out = fn()
    np.asarray(fence(out)).reshape(-1)[:1]

    def batch(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn()
        np.asarray(fence(o)).reshape(-1)[:1]
        return time.perf_counter() - t0

    las, lbs = [], []
    for _ in range(trials):
        las.append(batch(K))
        lbs.append(batch(3 * K))
    return max(min(lbs) - min(las), 1e-9) / (2 * K), out
