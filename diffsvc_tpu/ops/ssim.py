"""Gaussian-window SSIM on mel 'images' (reference modules/commons/ssim.py,
used by the FastSpeech2 mel_loss 'ssim' term).

Standard SSIM with an 11x11 gaussian window (sigma 1.5), C1=0.01^2,
C2=0.03^2, computed per-channel on [B, T, M, 1] inputs in [0, 1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2.0 * sigma**2))
    g = g / g.sum()
    w2d = np.outer(g, g)
    return w2d.astype(np.float32)


def _filter2d(x, window):
    """Depthwise 2-D convolution with SAME padding. x: [B, T, M]."""
    k = window.shape[0]
    w = jnp.asarray(window)[:, :, None, None]  # [k, k, 1, 1]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x[:, :, :, None], w, window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[:, :, :, 0]


def ssim(img1, img2, window_size: int = 11, size_average: bool = True):
    """img1/img2: [B, T, M] in [0, 1]."""
    window = _gaussian_window(window_size)
    mu1 = _filter2d(img1, window)
    mu2 = _filter2d(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, window) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, window) - mu2_sq
    sigma12 = _filter2d(img1 * img2, window) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / \
        ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    if size_average:
        return ssim_map.mean()
    return ssim_map
