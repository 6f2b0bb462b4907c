"""iSTFT-head vocoder family (TPU-first alternative; vocoders/istft_head).

Covers: the inverse-STFT op's reconstruction accuracy, the model forward
(shapes/finiteness/f0 conditioning/bf16), registry + wrapper + checkpoint
round-trip, and a GAN training smoke through training/vocoder_task.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsvc_tpu.config import HParams
from diffsvc_tpu.ops.istft import istft
from diffsvc_tpu.vocoders import istft_head as ih


def test_istft_reconstructs_stft():
    """istft(stft(y)) == y away from the edges (COLA with hann, hop=fft/4)."""
    n_fft, hop = 512, 128
    rng = np.random.RandomState(0)
    y = rng.randn(hop * 40).astype(np.float32)
    # centered complex STFT, zero padding (the forward convention in ops/mel)
    pad = n_fft // 2
    yp = np.pad(y, (pad, pad))
    t = 1 + len(y) // hop
    idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    spec = np.fft.rfft(yp[idx] * win, axis=-1)
    got = np.asarray(istft(jnp.asarray(spec.real, jnp.float32),
                           jnp.asarray(spec.imag, jnp.float32),
                           n_fft=n_fft, hop=hop, length=len(y)))
    assert got.shape == y.shape
    # interior reconstruction (first/last window are edge-attenuated)
    sl = slice(n_fft, len(y) - n_fft)
    np.testing.assert_allclose(got[sl], y[sl], atol=5e-4)


CFG = ih.IstftVocoderConfig(num_mels=16, dim=128, n_layers=2, n_fft=512,
                            hop=128, sampling_rate=16000, use_f0=True)


def test_model_forward_shapes_and_f0():
    params = ih.init(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(1)
    mel = jnp.asarray(rng.randn(2, 24, 16) - 4, jnp.float32)
    f0a = jnp.full((2, 24), 220.0)
    f0b = jnp.full((2, 24), 440.0)
    wav_a = ih.apply(params, CFG, mel, f0a)
    assert wav_a.shape == (2, 24 * 128)
    assert np.isfinite(np.asarray(wav_a)).all()
    wav_b = ih.apply(params, CFG, mel, f0b)
    assert np.abs(np.asarray(wav_a) - np.asarray(wav_b)).max() > 1e-6
    # bf16 backbone runs and stays finite
    wav_bf = ih.apply(params, CFG, mel, f0a, dtype=jnp.bfloat16)
    assert np.isfinite(np.asarray(wav_bf)).all()


def test_registry_wrapper_and_ckpt_roundtrip(tmp_path):
    from diffsvc_tpu.vocoders.base import get_vocoder_cls

    hp = HParams(vocoder="IstftVocoder", audio_num_mel_bins=16, fft_size=512,
                 hop_size=128, audio_sample_rate=16000, use_nsf=True,
                 istft_dim=128, istft_layers=2, vocoder_ckpt="")
    cls = get_vocoder_cls(hp)
    assert cls is ih.IstftVocoder
    assert get_vocoder_cls(HParams(vocoder="istftvocoder")) is ih.IstftVocoder

    w = cls(hp)
    mel = np.random.RandomState(0).randn(24, 16).astype(np.float32) - 4
    wav = w.spec2wav(mel, f0=np.full(24, 200.0, np.float32))
    assert wav.shape == (24 * 128,)

    path = str(tmp_path / "istft_voc.npz")
    ih.save_params(path, w.params)
    restored = ih.load_params(path, w.cfg)
    for a, b in zip(jax.tree.leaves(w.params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vocoder_task_training_smoke():
    """Two G/D steps of the GAN vocoder trainer with the istft family:
    finite losses, parameters actually update."""
    from diffsvc_tpu.training.vocoder_task import VocoderTask

    hp = HParams(
        vocoder="IstftVocoder", audio_num_mel_bins=16, fft_size=512,
        hop_size=128, win_size=512, audio_sample_rate=16000, fmin=30,
        fmax=7600, use_nsf=True, istft_dim=128, istft_layers=2,
        seed=7, vocoder_lr=2e-4, lambda_mel=45.0)
    task = VocoderTask(hp)
    state = task.init_state()
    rng = np.random.RandomState(0)
    t = 16
    batch = {
        "mels": jnp.asarray(rng.randn(2, t, 16) - 4, jnp.float32),
        "f0": jnp.full((2, t), 180.0, jnp.float32),
        "wav": jnp.asarray(0.2 * rng.randn(2, t * 128), jnp.float32),
    }
    g0 = jax.tree.leaves(state["g_params"])[0].copy()
    for i in range(2):
        state, metrics = task.train_step(state, batch, jax.random.PRNGKey(i))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    g1 = jax.tree.leaves(state["g_params"])[0]
    assert np.abs(np.asarray(g1) - np.asarray(g0)).max() > 0
