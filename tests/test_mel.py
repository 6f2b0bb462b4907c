import jax.numpy as jnp
import numpy as np
import torch

from diffsvc_tpu.config import HParams
from diffsvc_tpu.ops import mel as mel_ops


def _rand_wav(n=24000, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n) * 0.1).astype(np.float32)


def test_stft_matches_torch_nsf_variant():
    """The NSF STFT (reflect pad, center=False, sqrt(pow+1e-9)) must match
    torch.stft numerics (the reference nvSTFT path)."""
    wav = _rand_wav(8192)
    n_fft, hop, win = 512, 128, 512
    pad = (n_fft - hop) // 2
    y = torch.nn.functional.pad(
        torch.from_numpy(wav)[None, None], (pad, pad), mode="reflect")[0, 0]
    spec_t = torch.stft(y[None], n_fft, hop_length=hop, win_length=win,
                        window=torch.hann_window(win), center=False,
                        return_complex=True)
    mag_t = torch.sqrt(spec_t.real**2 + spec_t.imag**2 + 1e-9)[0].numpy().T

    yj = jnp.pad(jnp.asarray(wav), (pad, pad), mode="reflect")
    mag_j = np.asarray(mel_ops.stft_mag(yj, n_fft, hop, win, center=False, mag_eps=1e-9))
    assert mag_t.shape == mag_j.shape
    np.testing.assert_allclose(mag_j, mag_t, rtol=1e-4, atol=1e-4)


def test_stft_center_frame_count():
    wav = _rand_wav(24000)
    m = mel_ops.stft_mag(jnp.asarray(wav), 512, 128, 512, center=True)
    assert m.shape[0] == 1 + len(wav) // 128  # librosa center=True count


def test_mel_filterbank_properties():
    fb = mel_ops.mel_filterbank(24000, 512, 80, 30.0, 12000.0)
    assert fb.shape == (80, 257)
    assert (fb >= 0).all()
    # each filter is a triangle: one contiguous support region
    for i in range(80):
        nz = np.nonzero(fb[i])[0]
        assert len(nz) > 0
        assert (np.diff(nz) == 1).all()
    # slaney normalization: peak of filter i ~ 2/(hz[i+2]-hz[i])
    mel_pts = np.linspace(mel_ops.hz_to_mel(30.0), mel_ops.hz_to_mel(12000.0), 82)
    hz = mel_ops.mel_to_hz(mel_pts)
    peaks = fb.max(axis=1)
    expect = 2.0 / (hz[2:] - hz[:-2])
    ratio = peaks / expect
    # low filters are narrower than the FFT bin spacing, so their sampled
    # peak undershoots the ideal apex; check the well-resolved ones
    assert (ratio[20:] > 0.5).all()
    assert (ratio < 1.01).all()


def test_slaney_mel_scale_golden():
    # Slaney scale: linear below 1 kHz (200/3 Hz per mel), log above
    np.testing.assert_allclose(mel_ops.hz_to_mel(1000.0), 15.0, atol=1e-9)
    np.testing.assert_allclose(mel_ops.mel_to_hz(15.0), 1000.0, atol=1e-6)
    np.testing.assert_allclose(mel_ops.hz_to_mel(200.0), 3.0, atol=1e-9)
    f = mel_ops.mel_to_hz(np.array([20.0, 30.0, 40.0]))
    np.testing.assert_allclose(mel_ops.hz_to_mel(f), [20.0, 30.0, 40.0], rtol=1e-9)


def test_wav2spec_pwg_shape_and_pad():
    hp = HParams(vocoder="hifigan", audio_sample_rate=24000, fft_size=512,
                 hop_size=128, win_size=512, audio_num_mel_bins=80, fmin=30,
                 fmax=12000, wav2spec_eps=1e-6)
    wav = _rand_wav(24000 + 37)
    wav_out, m = mel_ops.wav2spec(wav, hp)
    assert m.shape[1] == 80
    assert m.shape[0] == 1 + len(wav) // 128
    assert len(wav_out) == m.shape[0] * 128  # padded to hop multiple
    assert np.isfinite(m).all()


def test_wav2spec_nsf_log10_domain():
    hp = HParams(vocoder="network.vocoders.nsf_hifigan.NsfHifiGAN",
                 audio_sample_rate=44100, fft_size=2048, hop_size=512,
                 win_size=2048, audio_num_mel_bins=128, fmin=40, fmax=16000)
    wav = _rand_wav(44100)
    _, m = mel_ops.wav2spec(wav, hp)
    assert m.shape[1] == 128
    # ln->log10 conversion: silence floor = log10(1e-5) = -5
    silent = np.zeros(44100, np.float32)
    _, ms = mel_ops.wav2spec(silent, hp)
    np.testing.assert_allclose(ms, -5.0 * np.ones_like(ms), atol=1e-4)


def test_energy_from_mel():
    mel = np.log10(np.full((10, 80), 2.0))
    e = mel_ops.energy_from_mel(mel)
    # quirk parity: natural exp of log10 values
    expect = np.sqrt(np.sum(np.exp(np.log10(2.0)) ** 2 * np.ones(80)))
    np.testing.assert_allclose(e, expect, rtol=1e-6)


def test_dft_matmul_path_matches_rfft(monkeypatch):
    """The TPU DFT-as-matmul branch must match the rFFT branch (CPU runs
    the rfft path by default; force the matmul branch here)."""
    from diffsvc_tpu.ops import mel as mel_ops

    rng = np.random.RandomState(0)
    wav = rng.randn(8000).astype(np.float32)
    ref = np.asarray(mel_ops.stft_mag(jnp.asarray(wav), 512, 128, 512))
    monkeypatch.setattr(mel_ops, "_use_dft_matmul", lambda: True)
    got = np.asarray(mel_ops.stft_mag(jnp.asarray(wav), 512, 128, 512))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)
    # and through the full mel stage
    ref_mel = np.asarray(mel_ops.wav2mel_nsf.__wrapped__(
        jnp.asarray(wav), sr=8000, n_fft=512, hop=128, win_length=512,
        n_mels=40, fmin=30.0, fmax=4000.0))
    monkeypatch.undo()
    got_mel = np.asarray(mel_ops.wav2mel_nsf.__wrapped__(
        jnp.asarray(wav), sr=8000, n_fft=512, hop=128, win_length=512,
        n_mels=40, fmin=30.0, fmax=4000.0))
    np.testing.assert_allclose(got_mel, ref_mel, atol=5e-3)
