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


def test_pqmf_perfect_reconstruction():
    pqmf = PQMF(subbands=4)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4096).astype(np.float32) * 0.3)
    sub = pqmf.analysis(x)
    assert sub.shape == (1, 1024, 4)
    rec = pqmf.synthesis(sub)
    assert rec.shape == (1, 4096)
    # near-perfect reconstruction; the symmetric taps//2 padding at each
    # stage already compensates the filter group delay (net delay 0)
    a = np.asarray(x[0])
    b = np.asarray(rec[0])
    err = np.abs(a - b).mean() / np.abs(a).mean()
    assert err < 0.01, err
