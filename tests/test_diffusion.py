from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from diffsvc_tpu.models import diffusion as D


def _cfg(**kw):
    base = dict(timesteps=1000, K_step=1000, loss_type="l2",
                schedule_type="linear", max_beta=0.02, keep_bins=8,
                pndm_speedup=0)
    base.update(kw)
    return D.DiffusionConfig(**base)


def test_schedule_tables_golden():
    """The 12 tables are pure functions of config; verify against an
    independent numpy derivation (reference diffusion.py:85-123)."""
    cfg = _cfg()
    t = D.make_tables(cfg)
    betas = np.linspace(1e-4, 0.02, 1000)
    alphas_cumprod = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(t["betas"]), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t["alphas_cumprod"]), alphas_cumprod, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t["sqrt_one_minus_alphas_cumprod"]),
                               np.sqrt(1 - alphas_cumprod), rtol=1e-5)
    prev = np.append(1.0, alphas_cumprod[:-1])
    pv = betas * (1 - prev) / (1 - alphas_cumprod)
    np.testing.assert_allclose(np.asarray(t["posterior_variance"]), pv, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(t["posterior_mean_coef1"]),
        betas * np.sqrt(prev) / (1 - alphas_cumprod), rtol=1e-4)


def test_cosine_schedule_bounds():
    cfg = _cfg(schedule_type="cosine")
    t = D.make_tables(cfg)
    b = np.asarray(t["betas"])
    assert (b >= 0).all() and (b <= 0.999).all()
    assert b[0] < b[-1]


def test_q_sample():
    cfg = _cfg()
    t = D.make_tables(cfg)
    x0 = jnp.ones((2, 4, 8))
    noise = jnp.full((2, 4, 8), 0.5)
    ts = jnp.array([0, 999])
    out = D.q_sample(t, x0, ts, noise)
    ac = np.asarray(t["alphas_cumprod"])
    for b, step in enumerate([0, 999]):
        expect = np.sqrt(ac[step]) * 1.0 + np.sqrt(1 - ac[step]) * 0.5
        np.testing.assert_allclose(np.asarray(out[b]), expect, rtol=1e-5)


def test_norm_denorm_spec_roundtrip():
    smin = jnp.linspace(-6, -5, 8)
    smax = jnp.linspace(1, 2, 8)
    x = jnp.asarray(np.random.RandomState(0).uniform(-6, 2, (2, 5, 8)))
    n = D.norm_spec(x, smin, smax)
    r = D.denorm_spec(n, smin, smax)
    np.testing.assert_allclose(np.asarray(r), np.asarray(x), rtol=1e-5)


def _numpy_plms_reference(tables, denoise, x, t_start, interval):
    """Reference PLMS ladder transcribed independently in numpy with a deque
    (mirrors network/diff/diffusion.py:165-198 semantics)."""
    ac = np.asarray(tables["alphas_cumprod"])

    def get_x_pred(x, noise_t, t):
        a_t = ac[t]
        a_prev = ac[max(t - interval, 0)]
        a_t_sq, a_prev_sq = np.sqrt(a_t), np.sqrt(a_prev)
        x_delta = (a_prev - a_t) * (
            (1 / (a_t_sq * (a_t_sq + a_prev_sq))) * x
            - 1 / (a_t_sq * (np.sqrt((1 - a_prev) * a_t) + np.sqrt((1 - a_t) * a_prev))) * noise_t)
        return x + x_delta

    noise_list = deque(maxlen=4)
    for t in reversed(range(0, t_start, interval)):
        noise_pred = denoise(x, t)
        if len(noise_list) == 0:
            x_pred = get_x_pred(x, noise_pred, t)
            noise_pred_prev = denoise(x_pred, max(t - interval, 0))
            noise_prime = (noise_pred + noise_pred_prev) / 2
        elif len(noise_list) == 1:
            noise_prime = (3 * noise_pred - noise_list[-1]) / 2
        elif len(noise_list) == 2:
            noise_prime = (23 * noise_pred - 16 * noise_list[-1] + 5 * noise_list[-2]) / 12
        else:
            noise_prime = (55 * noise_pred - 59 * noise_list[-1]
                           + 37 * noise_list[-2] - 9 * noise_list[-3]) / 24
        x = get_x_pred(x, noise_prime, t)
        noise_list.append(noise_pred)
    return x


def test_plms_scan_matches_reference_ladder():
    """The lax.scan PLMS must match a step-by-step numpy transcription of the
    reference algorithm, using a deterministic linear fake denoiser."""
    cfg = _cfg(timesteps=100, K_step=100)
    tables = D.make_tables(cfg)
    rng = np.random.RandomState(1)
    x0 = rng.randn(1, 6, 8).astype(np.float32)
    W = rng.randn(8, 8).astype(np.float32) * 0.05

    def denoise_np(x, t):
        return x @ W + 0.001 * t

    def denoise_jax(x, t):
        return x @ jnp.asarray(W) + 0.001 * t[:, None, None].astype(x.dtype)

    # non-divisor intervals (7, 30, 33) exercise the ceil(t/interval) grid:
    # reference reversed(range(0, 100, 30)) starts at t=90, not t=60
    for interval in (7, 10, 25, 30, 33, 50, 100):
        x_ref = _numpy_plms_reference(tables, denoise_np, x0.copy(), 100, interval)
        x_jax = D.p_sample_plms_scan(tables, denoise_jax, jnp.asarray(x0), 100, interval)
        np.testing.assert_allclose(np.asarray(x_jax), x_ref, rtol=2e-3, atol=2e-4)


def test_ddpm_scan_runs_and_masks_noise_at_t0():
    cfg = _cfg(timesteps=10, K_step=10)
    tables = D.make_tables(cfg)

    def denoise(x, t):
        return jnp.zeros_like(x)

    x = jnp.ones((1, 4, 8))
    out = D.p_sample_ddpm_scan(tables, denoise, x, 10, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()


def test_p_losses_zero_when_predicting_noise():
    cfg = _cfg()
    tables = D.make_tables(cfg)
    x0 = jnp.zeros((2, 4, 8))
    captured = {}

    def perfect_denoise(x_noisy, t):
        return captured["noise"]

    # with x0=0, x_noisy = sqrt_1m_ac * noise; recover noise exactly
    rng = jax.random.PRNGKey(0)
    noise = jax.random.normal(rng, x0.shape)
    x_noisy = D.q_sample(tables, x0, jnp.array([5, 500]), noise)
    captured["noise"] = noise
    loss = D.p_losses(tables, perfect_denoise, x0, jnp.array([5, 500]), rng, "l2")
    assert float(loss) < 1e-10


def test_p_losses_sample_mask_exact_for_both_loss_types():
    """Padding the batch axis with masked rows must not change the loss —
    for l2 AND l1 (the l1 denominator must renormalize over real rows)."""
    cfg = _cfg()
    tables = D.make_tables(cfg)
    rng = jax.random.PRNGKey(7)
    b_real, b_pad, T, M = 5, 8, 4, 8
    x0 = jax.random.normal(jax.random.fold_in(rng, 1), (b_real, T, M))
    nonpad = jnp.ones((b_real, T))
    t = jnp.arange(b_real) * 3 + 2

    def denoise(x, tt):
        return 0.1 * x

    for loss_type in ("l1", "l2"):
        base = D.p_losses(tables, denoise, x0, t, rng, loss_type,
                          nonpadding=nonpad,
                          sample_mask=jnp.ones((b_real,)))
        x0p = jnp.concatenate([x0, jnp.zeros((b_pad - b_real, T, M))])
        tp = jnp.concatenate([t, jnp.zeros((b_pad - b_real,), t.dtype)])
        nonpadp = jnp.concatenate([nonpad, jnp.ones((b_pad - b_real, T))])
        mask = jnp.concatenate([jnp.ones((b_real,)),
                                jnp.zeros((b_pad - b_real,))])
        # the same per-row noise draws: p_losses draws noise for the whole
        # batch, so compare padded-masked vs a mask of ones at size b_real
        padded = D.p_losses(tables, denoise, x0p, tp, rng, loss_type,
                            nonpadding=nonpadp, sample_mask=mask)
        # rows are independent given per-row noise; the padded rows are
        # masked out, so the normalized losses must agree closely (noise
        # differs only through the batch-shaped PRNG draw)
        assert np.isfinite(float(padded))
        # exactness check with identical noise: mask-weighted renorm
        noise = jax.random.normal(rng, x0p.shape)
        xn = D.q_sample(tables, x0p, tp, noise)
        err = jnp.abs(noise - denoise(xn, tp)) if loss_type == "l1" else (
            noise - denoise(xn, tp)) ** 2
        manual_real = (err[:b_real]).mean()
        np.testing.assert_allclose(float(padded), float(manual_real), rtol=1e-5)
