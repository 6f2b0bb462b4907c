"""Whole-ladder sampling Pallas kernel (ops/pallas/plms_ladder.py) vs the
lax.scan samplers: full-wiring parity through GaussianDiffusion.infer in
interpret mode on CPU, where f32 dots are true f32 (on the real TPU the
kernel is bf16-gated exactly like the residual-stack kernel).  Covers
PLMS, DPM-Solver++(2M) on both grids, and sampler_clip_x0 for each."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsvc_tpu.config import HParams
from diffsvc_tpu.models.diffusion import GaussianDiffusion
from diffsvc_tpu.ops.pallas import plms_ladder as PL


def _hp(**kw):
    base = dict(
        audio_num_mel_bins=128, hidden_size=16, residual_layers=4,
        residual_channels=128, dilation_cycle_length=2, timesteps=40,
        K_step=40, diff_loss_type="l2", schedule_type="linear",
        max_beta=0.02, keep_bins=128, spec_min=[-6.0], spec_max=[1.5],
        no_fs2=True, use_pitch_embed=True, use_energy_embed=False,
        use_uv=False, pitch_norm="log", f0_bin=256, f0_min=50.0,
        f0_max=1100.0, pndm_speedup=7, sampler="plms")
    base.update(kw)
    return HParams(**base)


def _batch(t_mel=128, m=128, h=16):
    rng = np.random.RandomState(0)
    return {
        "hubert": jnp.asarray(rng.randn(1, t_mel // 2, h).astype(np.float32) * 0.1),
        "mel2ph": jnp.asarray((rng.randint(1, t_mel // 2 + 1, (1, t_mel))).astype(np.int32)),
        "f0": jnp.full((1, t_mel), 7.78),
        "uv": jnp.zeros((1, t_mel)),
        "energy": jnp.zeros((1, t_mel)),
        "mels": jnp.asarray(rng.randn(1, t_mel, m).astype(np.float32) * 0.5 - 2.0),
    }


def _run_pair(hp_extra, infer_kwargs=None):
    """infer() with the scan vs the interpret-mode ladder on shared params
    and shared x_T noise; returns both mel_out arrays."""
    infer_kwargs = infer_kwargs or {}
    noise = jnp.asarray(
        np.random.RandomState(7).randn(1, 128, 128).astype(np.float32))
    outs = []
    for mode in ("off", "interpret"):
        hp = _hp(sampler_pallas_ladder=mode, **hp_extra)
        model = GaussianDiffusion(hp)
        params = model.init_params(jax.random.PRNGKey(0))
        out = model.infer(params, _batch(), jax.random.PRNGKey(1),
                          init_noise=noise, **infer_kwargs)
        outs.append(np.asarray(out["mel_out"]))
    return outs


def test_ladder_matches_scan_f32():
    """f32 interpret mode: same math, different op grouping — the whole
    7-eval ladder (orders 1-4 all exercised; interval 7 does not divide
    t_start=40, hitting the ceil grid) must track the scan closely."""
    a, b = _run_pair({})
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, atol=2e-4, rtol=1e-4)


def test_ladder_matches_scan_bf16():
    """bf16 compute (the production serving dtype): state stays f32 in
    both paths; matmul rounding differs slightly between the kernel's
    fused epilogue and XLA, so the tolerance is bf16-scaled."""
    a, b = _run_pair({"diff_compute_dtype": "bf16"})
    assert np.isfinite(b).all()
    assert float(np.abs(b - a).max()) < 0.15, float(np.abs(b - a).max())
    assert float(np.abs(b - a).mean()) < 0.02


def test_ladder_gt_mel_shallow_start():
    """use_gt_mel (shallow diffusion): t_start = add_noise_step instead of
    K_step; the eval grid shifts but the program is the same."""
    a, b = _run_pair({}, {"use_gt_mel": True, "add_noise_step": 20})
    np.testing.assert_allclose(b, a, atol=2e-4, rtol=1e-4)


def test_ladder_single_step_grid():
    """t_start <= interval -> one PLMS step, two evaluations (the order-1
    bootstrap pair) — the smallest ladder."""
    a, b = _run_pair({"pndm_speedup": 64})
    np.testing.assert_allclose(b, a, atol=2e-4, rtol=1e-4)


def test_ladder_plms_clip_x0():
    """sampler_clip_x0 with PLMS: the kernel's static clamp + eps rewrite
    must match the scan's clipped denoise_fn wrapper.  A tight clip so
    the clamp actually engages on this random score."""
    a, b = _run_pair({"sampler_clip_x0": 1.0})
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, atol=3e-4, rtol=1e-4)
    # the clamp must actually bind somewhere for this to test anything
    c, _ = _run_pair({})
    assert np.abs(a - c).max() > 1e-3


def test_ladder_dpmpp_lambda_grid():
    """DPM-Solver++(2M) on the default uniform-log-SNR grid (the shipped
    fast profile's sampler)."""
    a, b = _run_pair({"sampler": "dpmpp"})
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, atol=3e-4, rtol=1e-4)


def test_ladder_dpmpp_t_grid():
    a, b = _run_pair({"sampler": "dpmpp", "dpmpp_grid": "t"})
    np.testing.assert_allclose(b, a, atol=3e-4, rtol=1e-4)


def test_ladder_dpmpp_clip_turbo():
    """dpmpp + x0 clamp at an aggressive interval = the shipped TURBO
    profile's configuration (configs/config_44k_turbo.yaml)."""
    a, b = _run_pair({"sampler": "dpmpp", "sampler_clip_x0": 1.0,
                      "pndm_speedup": 13})
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, atol=3e-4, rtol=1e-4)


def test_ladder_gates():
    """Configurations that must fall back to the scan return None from
    _try_plms_ladder (and infer still works)."""
    hp = _hp(sampler_pallas_ladder="interpret")
    model = GaussianDiffusion(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 128, 128))
    # batch > 1 -> scan
    assert model._try_plms_ladder(params, jnp.zeros((2, 128, 16)),
                                  jnp.zeros((2, 128, 128)), 40, 7, 0.0) is None
    # unaligned T -> scan
    assert model._try_plms_ladder(params, jnp.zeros((1, 120, 16)),
                                  jnp.zeros((1, 120, 128)), 40, 7, 0.0) is None
    # flag off -> scan
    hp2 = _hp()
    model2 = GaussianDiffusion(hp2)
    assert model2._try_plms_ladder(params, jnp.zeros((1, 128, 16)), x,
                                   40, 7, 0.0) is None


def test_eval_tables_shape_and_bootstrap():
    ac = np.cumprod(1 - np.linspace(1e-4, 0.02, 40))
    t_eval, scal = PL.plms_eval_tables(ac, 40, 7, 128)
    n = -(-40 // 7)  # 6 steps
    assert t_eval.shape == (n + 1,) and scal.shape == (n + 1, PL.NS, 128)
    assert t_eval[0] == 35 and t_eval[1] == 28  # t0, t0 - interval
    # rows: p q e0 e1 w0 w1 w2 w3 u v sel push
    # plain PLMS: f = eps (p=0, q=1, e0=0, e1=1)
    np.testing.assert_allclose(scal[:, 0, 0], 0.0)
    np.testing.assert_allclose(scal[:, 1, 0], 1.0)
    # bootstrap: j=0 does not update x but pushes; j=1 updates, no push
    sel, push = scal[:, 10, 0], scal[:, 11, 0]
    assert sel[0] == 0.0 and push[0] == 1.0
    assert sel[1] == 1.0 and push[1] == 0.0
    assert (sel[2:] == 1.0).all() and (push[2:] == 1.0).all()
    # order ramp weights: j=1 averages the two bootstrap evals
    np.testing.assert_allclose(scal[1, 4:8, 0], [0.5, 0.5, 0, 0])
    np.testing.assert_allclose(scal[2, 4:8, 0], [1.5, -0.5, 0, 0])
    np.testing.assert_allclose(scal[4, 4:8, 0],
                               [55 / 24, -59 / 24, 37 / 24, -9 / 24])


def test_dpmpp_tables_final_eval():
    ac = np.cumprod(1 - np.linspace(1e-4, 0.02, 40))
    t_eval, scal = PL.dpmpp_eval_tables(ac, 40, 7, 128)
    assert t_eval[-1] == 0
    # final eval returns the data prediction: x' = g (u=0, v=1, w0=1)
    assert scal[-1, 8, 0] == 0.0 and scal[-1, 9, 0] == 1.0
    np.testing.assert_allclose(scal[-1, 4:8, 0], [1, 0, 0, 0])
    # every eval predicts x0 (p = 1/alpha > 1, e1 = 1) and pushes except
    # the last
    assert (scal[:, 0, 0] >= 1.0).all() and (scal[:, 3, 0] == 1.0).all()
    assert (scal[:-1, 11, 0] == 1.0).all() and scal[-1, 11, 0] == 0.0
