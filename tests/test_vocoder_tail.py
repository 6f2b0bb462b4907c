"""Parity tests for the fused Pallas vocoder tail (ops/pallas/vocoder_tail).

The kernel must reproduce generator.apply_packed (itself bit-parity-tested
against generator.apply and the torch reference generator) on CPU in
interpret mode with fp32 tap weights.  Covers: NSF + plain configs,
s0 = 0 and s0 = 1 starts, single- and multi-tile execution, and ragged
(non-divisible) sequence lengths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsvc_tpu.ops.pallas import vocoder_tail as vt
from diffsvc_tpu.vocoders import generator as gen


def _build(cfg, seed=0):
    params = gen.init(jax.random.PRNGKey(seed), cfg)
    packed = gen.pack_params(params, cfg, 128)
    built = gen.build_tail_params(params, packed, cfg, 128,
                                  weight_dtype=jnp.float32)
    assert built is not None
    return params, packed, built


def _run_pair(cfg, t0, ts, seed=0, use_f0=True):
    params, packed, (plan, tp) = _build(cfg, seed)
    key = jax.random.PRNGKey(seed + 1)
    k1, k2, k3 = jax.random.split(key, 3)
    mel = jax.random.normal(k1, (1, t0, cfg.num_mels))
    f0 = None
    rng = None
    if use_f0 and cfg.use_nsf:
        f0 = 100.0 + 80.0 * jax.random.uniform(k2, (1, t0))
        f0 = f0 * (jax.random.uniform(k3, (1, t0)) > 0.3)  # some unvoiced
        rng = jax.random.PRNGKey(7)
    ref = gen.apply_packed(packed, cfg, mel, f0, rng)
    got = gen.apply_tail(tp, cfg, mel, f0, rng, plan=plan, ts=ts,
                         interpret=True)
    return np.asarray(ref), np.asarray(got), plan


CFG_S0 = gen.HifiGanConfig(
    num_mels=16, upsample_initial_channel=256,
    upsample_rates=(8, 2, 2), upsample_kernel_sizes=(16, 4, 4),
    resblock="1", resblock_kernel_sizes=(3, 7),
    resblock_dilation_sizes=((1, 3), (1, 2)), sampling_rate=8000,
    use_nsf=True, harmonic_num=4)

CFG_S1 = gen.HifiGanConfig(
    num_mels=16, upsample_initial_channel=512,
    upsample_rates=(4, 2, 2), upsample_kernel_sizes=(8, 4, 4),
    resblock="1", resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3, 5),), sampling_rate=8000,
    use_nsf=True, harmonic_num=4)

CFG_RB2 = CFG_S0._replace(resblock="2", use_nsf=False)


def test_plan_geometry():
    _, _, (plan, tp) = _build(CFG_S0)
    assert plan.s0 == 0 and plan.p_fin == 4   # P grows 1 -> 2 -> 4
    assert plan.n_in == 1 + 2                 # x + injections for stages 1,2
    assert tp["wcat"].shape[0] == plan.n_taps
    _, _, (plan1, _) = _build(CFG_S1)
    assert plan1.s0 == 1 and plan1.p_fin == 2 and plan1.n_in == 1 + 1


def test_tail_matches_packed_nsf_s0():
    ref, got, _ = _run_pair(CFG_S0, t0=24, ts=8192)
    assert ref.shape == got.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_tail_matches_packed_nsf_s1():
    ref, got, _ = _run_pair(CFG_S1, t0=24, ts=8192)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_tail_multi_tile_and_ragged():
    # t_b = 20*8 = 160 blocks, ts=24 -> 7 tiles with a ragged last tile;
    # halo exceeds ts, exercising deep-halo correctness
    ref, got, plan = _run_pair(CFG_S0, t0=20, ts=24)
    assert plan.halo > 24
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_tail_plain_hifigan_resblock2():
    ref, got, _ = _run_pair(CFG_RB2, t0=16, ts=8192, use_f0=False)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_unsupported_configs_return_none():
    # never reaches a C == 128 stage with pack factor 1
    cfg = gen.HifiGanConfig(
        num_mels=8, upsample_initial_channel=192,
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        resblock="1", resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1,),))
    assert vt.kernel_start_stage(cfg) is None
    params = gen.init(jax.random.PRNGKey(0), cfg)
    packed = gen.pack_params(params, cfg, 128)
    assert gen.build_tail_params(params, packed, cfg, 128) is None


def test_supported_gate():
    _, _, (plan, _) = _build(CFG_S0)
    assert vt.supported(plan, 1)
    assert not vt.supported(plan, 2)          # batch != 1
    assert not vt.supported(None, 1)


def test_apply_packed_unwraps_tail_params_dict():
    """Review r3 fix: setup_serving replaces wrapper.run_params with the
    tail-params dict; the modular Svc batch-vocoder passes that dict to
    gen.apply_packed directly and must get the packed kernels, not a
    KeyError."""
    from types import SimpleNamespace

    params, packed, (plan, tp) = _build(CFG_S0)
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, 16, CFG_S0.num_mels))
    f0 = 200.0 * jnp.ones((1, 16))
    rng = jax.random.PRNGKey(1)
    ref = gen.apply_packed(packed, CFG_S0, mel, f0, rng)
    got = gen.apply_packed(tp, CFG_S0, mel, f0, rng)   # the dict form
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # and the full setup_serving wiring produces that dict shape
    w = SimpleNamespace(params=params, cfg=CFG_S0)
    gen.setup_serving(w, {"vocoder_channel_pack": "on",
                          "vocoder_pallas_tail": "on"})
    assert w.tail_plan is not None and "wcat" in w.run_params


def test_apply_tail_no_f0_matches_packed():
    """Review r3 fix: an NSF plan run without f0 (spec2wav's no-f0 branch)
    must feed zero injections, matching apply_packed's skip-injection
    path — not re-DMA slab 0 as a bogus harmonic source."""
    _, packed, (plan, tp) = _build(CFG_S0)
    assert plan.n_in > 1
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 20, CFG_S0.num_mels))
    ref = gen.apply_packed(packed, CFG_S0, mel, None, None)
    got = gen.apply_tail(tp, CFG_S0, mel, None, None, plan=plan,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
