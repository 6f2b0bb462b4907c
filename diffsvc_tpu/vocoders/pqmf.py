"""PQMF pseudo-quadrature mirror filterbank (multi-band vocoding).

Parity target: vendored parallel_wavegan ``layers/pqmf.py`` — N-band
analysis/synthesis with a Kaiser-windowed prototype lowpass (taps=62,
cutoff=0.15, beta=9.0 for 4 bands).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def design_prototype_filter(taps: int = 62, cutoff_ratio: float = 0.15,
                            beta: float = 9.0) -> np.ndarray:
    """Kaiser-windowed sinc prototype lowpass h(n), length taps+1."""
    assert taps % 2 == 0
    omega_c = np.pi * cutoff_ratio
    n = np.arange(taps + 1) - taps / 2
    with np.errstate(invalid="ignore", divide="ignore"):
        h_i = np.sin(omega_c * n) / (np.pi * n)
    h_i[taps // 2] = cutoff_ratio  # limit at n=0
    w = np.kaiser(taps + 1, beta)
    return (h_i * w).astype(np.float64)


class PQMF:
    def __init__(self, subbands: int = 4, taps: int = 62,
                 cutoff_ratio: float = 0.15, beta: float = 9.0):
        self.subbands = subbands
        h_proto = design_prototype_filter(taps, cutoff_ratio, beta)
        h_analysis = np.zeros((subbands, len(h_proto)))
        h_synthesis = np.zeros((subbands, len(h_proto)))
        for k in range(subbands):
            # reference pqmf.py:80-84 centers the modulation at (taps-1)/2,
            # NOT taps/2 — a half-sample phase offset otherwise
            phase = (2 * k + 1) * (np.pi / (2 * subbands)) * (
                np.arange(taps + 1) - (taps - 1) / 2)
            shift = (-1) ** k * np.pi / 4
            h_analysis[k] = 2 * h_proto * np.cos(phase + shift)
            h_synthesis[k] = 2 * h_proto * np.cos(phase - shift)
        self.h_analysis = jnp.asarray(h_analysis, jnp.float32)   # [S, taps+1]
        self.h_synthesis = jnp.asarray(h_synthesis, jnp.float32)
        self.taps = taps

    def analysis(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, T] -> subband signals [B, T//S, S]."""
        pad = self.taps // 2
        k = self.h_analysis.shape[1]
        w = self.h_analysis.T[:, None, :]  # [k, 1, S] HIO
        y = jax.lax.conv_general_dilated(
            x[:, :, None], w, window_strides=(self.subbands,),
            padding=[(pad, pad)], dimension_numbers=("NHC", "HIO", "NHC"))
        return y

    def synthesis(self, subbands: jnp.ndarray) -> jnp.ndarray:
        """subbands: [B, T//S, S] -> x [B, T]."""
        s = self.subbands
        b, t, _ = subbands.shape
        # upsample by S (zero-stuffing) then filter with synthesis bank
        up = jnp.zeros((b, t * s, s), subbands.dtype)
        up = up.at[:, ::s, :].set(subbands * s)
        pad = self.taps // 2
        w = self.h_synthesis.T[:, :, None]  # [k, S, 1]
        y = jax.lax.conv_general_dilated(
            up, w, window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"))
        return y[:, :, 0]
