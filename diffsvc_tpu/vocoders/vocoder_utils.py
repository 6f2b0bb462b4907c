"""Spectral-subtraction denoise for vocoder output
(reference network/vocoders/vocoder_utils.py:7-15)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.mel import frame_signal, hann_window


def denoise(wav: np.ndarray, hp, v: float = 0.1) -> np.ndarray:
    """STFT -> clip(|S| - v, 0) -> iSTFT with the original phase."""
    n_fft, hop, win = hp["fft_size"], hp["hop_size"], hp["win_size"]
    y = jnp.pad(jnp.asarray(wav, jnp.float32), (n_fft // 2, n_fft // 2))
    w = hann_window(win)
    if win < n_fft:
        lp = (n_fft - win) // 2
        w = np.pad(w, (lp, n_fft - win - lp))
    frames = frame_signal(y, n_fft, hop) * w[None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.abs(spec)
    phase = jnp.angle(spec)
    mag = jnp.clip(mag - v, 0.0, None)
    spec = mag * jnp.exp(1j * phase)
    frames_rec = jnp.fft.irfft(spec, n=n_fft, axis=-1) * w[None, :]

    # overlap-add with window-square normalization
    n = frames_rec.shape[0]
    out_len = n_fft + (n - 1) * hop
    out = np.zeros(out_len, np.float64)
    norm = np.zeros(out_len, np.float64)
    fr = np.asarray(frames_rec)
    w2 = np.asarray(w, np.float64) ** 2
    for i in range(n):
        out[i * hop: i * hop + n_fft] += fr[i]
        norm[i * hop: i * hop + n_fft] += w2
    out = out / np.maximum(norm, 1e-8)
    return out[n_fft // 2: n_fft // 2 + len(wav)].astype(np.float32)
