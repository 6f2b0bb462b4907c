"""Test harness: force the host CPU platform with 8 virtual devices so
multi-chip sharding semantics are exercised without TPUs (SURVEY.md §4d)."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def assert_allclose_ulp(actual, desired, ulps=8, err_msg=""):
    """Tolerance policy for cross-program float comparisons.

    Two XLA programs computing the same math (e.g. a per-step dispatch vs a
    lax.scan over steps, or with/without oneDNN reduction reassociation on a
    given host) may associate reductions differently, so results can differ
    by a few ulps even when the logic is identical. Bitwise equality is only
    asserted when the SAME compiled program runs twice; anything compiled as
    a different program uses this ulp-scaled bound: |a-b| <= ulps * eps *
    max(|a|, |b|, 1), i.e. a mixed rtol/atol with atol anchored at
    magnitude 1 (parameters here are O(1) or smaller).
    """
    actual = np.asarray(actual)
    desired = np.asarray(desired)
    eps = np.finfo(actual.dtype if actual.dtype.kind == "f" else np.float32).eps
    scale = np.maximum(np.maximum(np.abs(actual), np.abs(desired)), 1.0)
    tol = ulps * eps * scale
    bad = np.abs(actual.astype(np.float64) - desired.astype(np.float64)) > tol
    if np.any(bad):
        worst = float(np.max(np.abs(actual - desired) / (eps * scale)))
        raise AssertionError(
            f"{err_msg}: {int(bad.sum())}/{bad.size} elements beyond "
            f"{ulps} ulps (worst {worst:.1f} ulps)")
