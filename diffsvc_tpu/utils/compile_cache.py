"""Persistent XLA compilation cache.

One call makes every jit in the process (feature stages, samplers, the fused
graph, train steps) reusable across process restarts — the 30-70 s warmup
compiles happen once per (shape-bucket, code version) and then load in
milliseconds. Enabled by default by the CLIs; opt out with
``DIFFSVC_NO_COMPILE_CACHE=1``.
"""

from __future__ import annotations

import os
import sys

_enabled = False


def enable(cache_dir: str = "") -> bool:
    global _enabled
    if _enabled or os.environ.get("DIFFSVC_NO_COMPILE_CACHE"):
        return _enabled
    import jax

    cache_dir = cache_dir or os.environ.get(
        "DIFFSVC_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "diffsvc_tpu", "xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
        print(f"| compilation cache: {cache_dir}", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"| compilation cache unavailable: {e}", file=sys.stderr)
    return _enabled
