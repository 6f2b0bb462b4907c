"""Pallas fused residual block: interpret-mode correctness vs the plain-JAX
reference (the compiled path is exercised on TPU by bench/microbench)."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffsvc_tpu.ops.pallas.diffnet_block import (PALLAS_OK,
                                                  fused_residual_block,
                                                  reference_block)

pytestmark = pytest.mark.skipif(not PALLAS_OK, reason="pallas unavailable")


@pytest.mark.parametrize("dilation", [1, 2, 4, 8])
def test_fused_block_matches_reference(dilation):
    rng = np.random.RandomState(0)
    B, T, C = 2, 256, 128
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.3)
    step = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.randn(B, T, 2 * C).astype(np.float32) * 0.3)
    wd = jnp.asarray(rng.randn(3, C, 2 * C).astype(np.float32) * 0.05)
    bd = jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.05)
    wo = jnp.asarray(rng.randn(C, 2 * C).astype(np.float32) * 0.05)
    bo = jnp.asarray(rng.randn(2 * C).astype(np.float32) * 0.05)
    xo_p, sk_p = fused_residual_block(x, step, cond, wd, bd, wo, bo,
                                      dilation=dilation, interpret=True)
    xo_r, sk_r = reference_block(x, step, cond, wd, bd, wo, bo, dilation)
    np.testing.assert_allclose(np.asarray(xo_p), np.asarray(xo_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sk_p), np.asarray(sk_r),
                               rtol=1e-5, atol=1e-5)


def test_fused_block_tile_boundaries():
    """Dilated taps crossing the internal tile boundary must be exact."""
    rng = np.random.RandomState(1)
    B, T, C = 1, 256, 128
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    step = jnp.zeros((B, C), jnp.float32)
    cond = jnp.zeros((B, T, 2 * C), jnp.float32)
    wd = jnp.asarray(rng.randn(3, C, 2 * C).astype(np.float32) * 0.05)
    bd = jnp.zeros((2 * C,), jnp.float32)
    wo = jnp.asarray(rng.randn(C, 2 * C).astype(np.float32) * 0.05)
    bo = jnp.zeros((2 * C,), jnp.float32)
    xo_p, _ = fused_residual_block(x, step, cond, wd, bd, wo, bo,
                                   dilation=8, interpret=True, tile_t=128)
    xo_r, _ = reference_block(x, step, cond, wd, bd, wo, bo, 8)
    # check the rows straddling the 128-tile boundary specifically
    np.testing.assert_allclose(np.asarray(xo_p[0, 120:136]),
                               np.asarray(xo_r[0, 120:136]),
                               rtol=1e-5, atol=1e-5)
