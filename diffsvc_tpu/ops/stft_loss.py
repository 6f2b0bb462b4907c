"""Multi-resolution STFT loss (vocoder training auxiliary).

Parity target: the vendored parallel_wavegan ``losses/stft_loss.py`` —
spectral-convergence + log-magnitude L1 at three resolutions
(1024/120/600, 2048/240/1200, 512/50/240 by default).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from .mel import stft_mag

DEFAULT_RESOLUTIONS: Tuple[Tuple[int, int, int], ...] = (
    (1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def spectral_convergence(mag_pred, mag_gt):
    return jnp.linalg.norm(mag_gt - mag_pred) / jnp.maximum(
        jnp.linalg.norm(mag_gt), 1e-9)


def log_stft_magnitude(mag_pred, mag_gt):
    return jnp.abs(jnp.log(jnp.maximum(mag_gt, 1e-7))
                   - jnp.log(jnp.maximum(mag_pred, 1e-7))).mean()


def stft_loss(y_pred, y_gt, fft_size: int, hop: int, win: int):
    # parallel_wavegan clamps the POWER at 1e-7 before sqrt
    # (stft_loss.py:25) — sets the silent-frame log floor to log sqrt(1e-7)
    # and keeps the gradient finite when a predicted bin is exactly 0
    mp = stft_mag(y_pred, fft_size, hop, win, center=True,
                  pad_mode="reflect", power_floor=1e-7)
    mg = stft_mag(y_gt, fft_size, hop, win, center=True,
                  pad_mode="reflect", power_floor=1e-7)
    return spectral_convergence(mp, mg), log_stft_magnitude(mp, mg)


def multi_resolution_stft_loss(
        y_pred, y_gt,
        resolutions: Sequence[Tuple[int, int, int]] = DEFAULT_RESOLUTIONS):
    """y_pred/y_gt: [T] waveforms. Returns (sc_loss, mag_loss) averaged over
    resolutions."""
    sc_total, mag_total = 0.0, 0.0
    for fft_size, hop, win in resolutions:
        sc, mag = stft_loss(y_pred, y_gt, fft_size, hop, win)
        sc_total += sc
        mag_total += mag
    n = len(resolutions)
    return sc_total / n, mag_total / n
