import jax
import jax.numpy as jnp
import numpy as np

from diffsvc_tpu.ops.stft_loss import multi_resolution_stft_loss
from diffsvc_tpu.vocoders import discriminators as D
from diffsvc_tpu.vocoders.pqmf import PQMF


def test_mpd_shapes_and_losses():
    key = jax.random.PRNGKey(0)
    params = D.init_mpd(key)
    y = jax.random.normal(key, (2, 4000)) * 0.1
    y_hat = jax.random.normal(jax.random.PRNGKey(1), (2, 4000)) * 0.1
    rs, gs, fr, fg = D.apply_mpd(params, y, y_hat)
    assert len(rs) == 5 and len(fr) == 5
    d_loss = D.discriminator_loss(rs, gs)
    g_loss = D.generator_loss(gs)
    f_loss = D.feature_loss(fr, fg)
    for v in (d_loss, g_loss, f_loss):
        assert np.isfinite(float(v))


def test_msd_shapes():
    key = jax.random.PRNGKey(0)
    params = D.init_msd(key)
    y = jax.random.normal(key, (1, 8000)) * 0.1
    rs, gs, fr, fg = D.apply_msd(params, y, y)
    assert len(rs) == 3
    # identical inputs -> zero feature loss, generator fooled exactly when
    # scores match
    assert float(D.feature_loss(fr, fg)) < 1e-6


def test_multi_resolution_stft_loss():
    t = np.arange(16000) / 16000
    y = jnp.asarray(0.5 * np.sin(2 * np.pi * 220 * t), jnp.float32)
    sc, mag = multi_resolution_stft_loss(y, y)
    assert float(sc) < 1e-5 and float(mag) < 1e-5
    y2 = jnp.asarray(0.5 * np.sin(2 * np.pi * 440 * t), jnp.float32)
    sc2, mag2 = multi_resolution_stft_loss(y2, y)
    assert float(sc2) > 0.1 and float(mag2) > 0.1


def test_pqmf_matches_reference_implementation():
    """Exact parity with an independent torch transcription of the vendored
    PQMF (pqmf.py:61-129: (taps-1)/2-centered cosine modulation, taps//2
    constant padding, updown conv up/down sampling)."""
    import torch
    import torch.nn.functional as F

    from diffsvc_tpu.vocoders.pqmf import design_prototype_filter

    subbands, taps = 4, 62
    pqmf = PQMF(subbands=subbands)
    rng = np.random.RandomState(0)
    x_np = rng.randn(1, 4096).astype(np.float32) * 0.3
    sub = pqmf.analysis(jnp.asarray(x_np))
    assert sub.shape == (1, 1024, 4)
    rec = pqmf.synthesis(sub)
    assert rec.shape == (1, 4096)

    h = design_prototype_filter(taps, 0.15, 9.0)
    ha = np.zeros((subbands, len(h)))
    hs = np.zeros((subbands, len(h)))
    grid = np.arange(taps + 1) - (taps - 1) / 2
    for k in range(subbands):
        ph = (2 * k + 1) * (np.pi / (2 * subbands)) * grid
        ha[k] = 2 * h * np.cos(ph + (-1) ** k * np.pi / 4)
        hs[k] = 2 * h * np.cos(ph - (-1) ** k * np.pi / 4)
    af = torch.from_numpy(ha).float().unsqueeze(1)
    sf = torch.from_numpy(hs).float().unsqueeze(0)
    updown = torch.zeros((subbands, subbands, subbands))
    for k in range(subbands):
        updown[k, k, 0] = 1.0
    pad = torch.nn.ConstantPad1d(taps // 2, 0.0)
    xt = torch.from_numpy(x_np)[:, None, :]
    sub_t = F.conv1d(F.conv1d(pad(xt), af), updown, stride=subbands)
    rec_t = F.conv1d(pad(F.conv_transpose1d(
        sub_t, updown * subbands, stride=subbands)), sf)
    np.testing.assert_allclose(np.asarray(sub)[0].T, sub_t[0].numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(rec)[0], rec_t[0, 0].numpy(),
                               atol=2e-5)


def test_pqmf_sine_reconstruction():
    """The reference filterbank reconstructs an in-band sine to a few
    percent at its net 2-sample delay (that IS the reference behavior)."""
    pqmf = PQMF(subbands=4)
    sr = 16000
    t = np.arange(4096) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    rec = np.asarray(pqmf.synthesis(pqmf.analysis(jnp.asarray(x[None])))[0])
    err = (np.abs(x - np.roll(rec, -2))[100:-100].mean()
           / np.abs(x[100:-100]).mean())
    assert err < 0.05, err
