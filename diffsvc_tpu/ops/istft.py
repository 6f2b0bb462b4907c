"""Inverse STFT as MXU matmuls + gather-free overlap-add.

TPU-first building block for the iSTFT-head vocoder family
(vocoders/istft_head.py): instead of upsampling a waveform through
small-channel convolutions (measured MXU pass-bound on TPU — BASELINE.md
round-3 analysis), the model predicts a complex spectrum per mel frame and
ONE inverse rDFT matmul + overlap-add renders audio.  Everything here is
wide matmuls ([T, n_bins] @ [n_bins, n_fft]) and reshape-shift adds — no
gathers, no tiny-channel convs.

No reference counterpart (the reference's vocoders are all conv
upsamplers); numerics validated against scipy.signal.istft-style
reconstruction in tests/test_istft_vocoder.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mel import hann_window


def _irdft_mats(n_fft: int):
    """[n_bins, n_fft] cos/sin synthesis matrices for the real inverse DFT:
    x[n] = (1/N) * sum_k w_k (Re S_k cos(2pi k n/N) - Im S_k sin(...)),
    w_k = 1 for k in {0, N/2} else 2."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    w = np.full((n_bins, 1), 2.0)
    w[0] = w[-1] = 1.0
    cos_m = (w * np.cos(ang) / n_fft).astype(np.float32)
    sin_m = (w * np.sin(ang) / n_fft).astype(np.float32)
    return cos_m, sin_m


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "length"))
def istft(re: jnp.ndarray, im: jnp.ndarray, *, n_fft: int, hop: int,
          length: int) -> jnp.ndarray:
    """Windowed inverse STFT with normalized overlap-add.

    :param re/im: [T, n_bins] real/imag spectra (one frame per mel hop)
    :param length: output samples; the frames are treated as CENTERED
        (librosa semantics): sample 0 corresponds to frame 0's window
        center, so ``n_fft//2`` leading samples are trimmed.
    Requires ``hop | n_fft`` (all shipped profiles: 2048/512, 512/128).
    """
    assert n_fft % hop == 0, (n_fft, hop)
    q = n_fft // hop
    t = re.shape[0]
    cos_m, sin_m = _irdft_mats(n_fft)
    win = hann_window(n_fft)
    frames = (jnp.matmul(re, jnp.asarray(cos_m))
              - jnp.matmul(im, jnp.asarray(sin_m))) * win[None, :]

    # gather-free overlap-add: frame j-th hop-block lands at block t+j
    fb = frames.reshape(t, q, hop)
    y = jnp.zeros(((t + q - 1), hop), frames.dtype)
    env = np.zeros(((t + q - 1), hop), np.float32)
    w2 = (win * win).reshape(q, hop)
    for j in range(q):
        y = y + jnp.pad(fb[:, j], ((j, q - 1 - j), (0, 0)))
        env[j: j + t] += w2[j]
    y = y / jnp.asarray(np.maximum(env, 1e-8))
    y = y.reshape(-1)
    start = n_fft // 2
    # static slice (start/length are trace constants): identical to a
    # dynamic_slice here, but stays a Slice under vmap (ONNX-exportable)
    return jnp.pad(y, (0, n_fft))[start:start + length]
