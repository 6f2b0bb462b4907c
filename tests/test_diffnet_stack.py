"""Parity tests for the fused Pallas residual stack
(ops/pallas/diffnet_stack.py) against the XLA lax.scan path, run in
pallas interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsvc_tpu.models import diffnet
from diffsvc_tpu.ops.pallas import diffnet_stack


def _setup(c=128, t=128, layers=8, cycle=4, mel=32, hid=128):
    cfg = diffnet.DiffNetConfig(
        in_dims=mel, encoder_hidden=hid, residual_layers=layers,
        residual_channels=c, dilation_cycle_length=cycle,
        pallas_stack="off")
    params = diffnet.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    spec = jnp.asarray(rng.randn(1, t, mel).astype(np.float32))
    cond = jnp.asarray(rng.randn(1, t, hid).astype(np.float32))
    step = jnp.asarray([41], jnp.int32)
    return cfg, params, spec, cond, step


def test_pallas_stack_matches_scan_fp32():
    cfg, params, spec, cond, step = _setup()
    ref = diffnet.apply(params, cfg, spec, step, cond, inference=True)
    got = diffnet.apply(params, cfg._replace(pallas_stack="interpret"),
                        spec, step, cond, inference=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_stack_matches_scan_bf16():
    cfg, params, spec, cond, step = _setup()
    cast = lambda tr: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, tr)
    pb = cast(params)
    ref = diffnet.apply(pb, cfg, spec.astype(jnp.bfloat16), step,
                        cond.astype(jnp.bfloat16), inference=True)
    got = diffnet.apply(pb, cfg._replace(pallas_stack="interpret"),
                        spec.astype(jnp.bfloat16), step,
                        cond.astype(jnp.bfloat16), inference=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_pallas_stack_dilation_cycle_respected():
    """Different dilation cycles change the receptive field; the kernel's
    program-id-derived shift must match the scan for cycle != 4 too."""
    cfg, params, spec, cond, step = _setup(layers=6, cycle=3)
    ref = diffnet.apply(params, cfg, spec, step, cond, inference=True)
    got = diffnet.apply(params, cfg._replace(pallas_stack="interpret"),
                        spec, step, cond, inference=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_stack_gates():
    """Unaligned shapes / batch > 1 / oversize VMEM must fall back to the
    scan (not crash): pallas_stack='interpret' with an unsupported shape
    silently takes the XLA path."""
    # batch 2 -> unsupported
    assert not diffnet_stack.supported(8, 4, 128, 128, 2)
    # unaligned C
    assert not diffnet_stack.supported(8, 4, 128, 96, 1)
    # unaligned T
    assert not diffnet_stack.supported(8, 4, 100, 128, 1)
    # production bf16 supported; fp32 rejected (Mosaic f32 matmuls are
    # single-pass bf16 — the fp32 quality-reference mode keeps XLA)
    assert diffnet_stack.supported(20, 4, 896, 384, 1, esize=2)
    assert not diffnet_stack.supported(20, 4, 896, 384, 1, esize=4)

    cfg, params, spec, cond, step = _setup()
    spec2 = jnp.concatenate([spec, spec])
    cond2 = jnp.concatenate([cond, cond])
    step2 = jnp.asarray([41, 41], jnp.int32)
    ref = diffnet.apply(params, cfg, spec2, step2, cond2, inference=True)
    got = diffnet.apply(params, cfg._replace(pallas_stack="interpret"),
                        spec2, step2, cond2, inference=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pallas_stack_training_path_unaffected():
    """inference=False (training) never enters the kernel, so grads flow."""
    cfg, params, spec, cond, step = _setup()
    cfg_on = cfg._replace(pallas_stack="interpret")

    def loss(p):
        out = diffnet.apply(p, cfg_on, spec, step, cond)  # inference=False
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    gn = jax.tree.leaves(jax.tree.map(lambda a: jnp.sum(jnp.abs(a)), g))
    assert np.isfinite(np.asarray(gn, np.float32)).all()


def test_vmapped_inference_stack_matches_scan():
    """vmap of the inference residual_stack (batched serving): the sample
    axis becomes a leading grid dim; each sample's VMEM scratch re-inits
    at layer 0 — outputs must match per-sample scan results."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffsvc_tpu.models import diffnet

    L, CYC, T, C, B = 4, 2, 128, 128, 3
    cfg = diffnet.DiffNetConfig(
        in_dims=16, encoder_hidden=32, residual_layers=L,
        residual_channels=C, dilation_cycle_length=CYC)
    params = diffnet.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    spec = jnp.asarray(rng.randn(B, T, 16), jnp.float32)
    tstep = jnp.asarray([2, 9, 15], jnp.int32)
    cond = jnp.asarray(rng.randn(B, T, 32) * 0.3, jnp.float32)

    ref = diffnet.apply(params, cfg._replace(pallas_stack="off"),
                        spec, tstep, cond, inference=True)
    got = diffnet.apply(params, cfg._replace(pallas_stack="interpret"),
                        spec, tstep, cond, inference=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
