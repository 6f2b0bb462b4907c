"""Tunnel load calibration: the no-op dispatch round-trip probe.

One tiny jitted op + a 4-float fetch is the minimum host->device->host
round trip.  On the tunneled bench host this is ~30 ms and drifts 1.5-2x
with tunnel load (BASELINE.md r2 protocol); measuring it IN-RUN is what
makes published RTFs interpretable without knowing the tunnel weather
(VERDICT r3 weak #1).  Shared by bench.py and tools/bench_realtime.py so
the calibration protocol cannot silently diverge between harnesses.
"""

import time

import numpy as np


def make_rtt_probe():
    """Return a zero-arg callable measuring one no-op dispatch RTT in
    seconds (compile happens here, outside any timing)."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((4,), jnp.float32)
    np.asarray(tiny(x))  # compile outside timing

    def probe():
        t0 = time.time()
        np.asarray(tiny(x))
        return time.time() - t0

    return probe


def median_rtt(probe, n: int = 5) -> float:
    """Median of ``n`` probe samples (seconds)."""
    return sorted(probe() for _ in range(n))[n // 2]
