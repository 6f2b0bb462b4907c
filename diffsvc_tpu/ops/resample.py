"""In-graph polyphase resampler (44.1 kHz -> 16 kHz for HuBERT).

Replicates scipy.signal.resample_poly's default design (the host resampler
in utils/audio_io.py and the reference's resampy call,
preprocessing/data_gen_utils.py:195): kaiser(5.0)-windowed FIR low-pass
with 10*max(up,down) half-length, zero-phase alignment, ceil-length output.

Formulated for XLA: all index math is static numpy; the device computation
is one [n_out, T] gather + row-gathered subfilter weights + a reduction,
which XLA fuses into the HuBERT prologue — this removes the last host-side
DSP stage from the fused serving graph (VERDICT r1 'Next #5').

Only O(n_out) index constants are baked into the HLO (the [up, T]
subfilter bank rides along as a tiny device constant) — never an
[n_out, T] table, which would blow up the serialized program
(see CLAUDE.md remote-compile note).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=16)
def _design(orig_sr: int, target_sr: int):
    """(subfilters [up, T], up, down, half_len) — scipy-compatible."""
    from scipy.signal import firwin

    g = math.gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    max_rate = max(up, down)
    half_len = 10 * max_rate
    h = firwin(2 * half_len + 1, 1.0 / max_rate,
               window=("kaiser", 5.0)) * up
    t_taps = -(-len(h) // up)
    sub = np.zeros((up, t_taps), np.float32)
    for p in range(up):
        taps = h[p::up]
        sub[p, : len(taps)] = taps
    return sub, up, down, half_len


def resample_length(n_in: int, orig_sr: int, target_sr: int) -> int:
    g = math.gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    return -(-n_in * up // down)


@lru_cache(maxsize=16)
def _block_design(orig_sr: int, target_sr: int):
    """Static block formulation: one block of `down` input samples yields
    `up` outputs. Returns (G [Lw, up], offset, Lw, up, down) where
    y[b, r] = sum_j x[b*down + offset + j] * G[j, r]."""
    sub, up, down, half_len = _design(orig_sr, target_sr)
    t_taps = sub.shape[1]
    i = np.arange(up, dtype=np.int64) * down + half_len
    phase = (i % up).astype(np.int64)
    c = (i // up).astype(np.int64)
    c_min, c_max = int(c.min()), int(c.max())
    offset = c_min - (t_taps - 1)
    l_w = c_max - c_min + t_taps
    g = np.zeros((l_w, up), np.float32)
    for r in range(up):
        for t in range(t_taps):
            g[(c[r] - c_min + t_taps - 1) - t, r] = sub[phase[r], t]
    return g, offset, l_w, up, down


def resample_poly_device(x, orig_sr: int, target_sr: int):
    """x [n] float -> [ceil(n*up/down)] float32, matching
    scipy.signal.resample_poly(x, up, down) to float32 accuracy.

    MXU formulation: the polyphase identity
    y[m] = sum_t h[p_m + t*up] * x[i_m//up - t] (i_m = m*down + half_len)
    is blocked per `down` input samples — overlapping contiguous windows
    [n_blocks, Lw] (a strided slice-gather, same pattern as STFT framing)
    times ONE static [Lw, up] tap matrix. No scatter-gather, one matmul.
    """
    if orig_sr == target_sr:
        return jnp.asarray(x, jnp.float32)
    if getattr(x, "ndim", 1) != 1:
        raise ValueError(f"resample_poly_device expects 1-D wav, got shape "
                         f"{x.shape}; vmap for batches")
    n_in = int(x.shape[0])
    n_out = resample_length(n_in, orig_sr, target_sr)
    g, offset, l_w, up, down = _block_design(int(orig_sr), int(target_sr))
    n_blocks = -(-n_out // up)

    import jax

    # Build the [n_blocks, Lw] overlapping windows gather-free: reshape the
    # padded signal into [*, down] blocks, then concatenate shifted block
    # views (window b = blocks b..b+q). Plain gather and a C_in=1 strided
    # conv both measured 60-90 ms on TPU; this is slices + one fp32 matmul.
    q, rem = divmod(l_w, down)
    pad_left = max(0, -offset)
    start = offset + pad_left  # == max(0, offset); 0 for every real design
    total = start + (n_blocks + q + 1) * down
    xp = jnp.pad(jnp.asarray(x, jnp.float32),
                 (pad_left, max(0, total - n_in - pad_left)))
    blocks = xp[start: start + (n_blocks + q + 1) * down].reshape(-1, down)
    parts = [blocks[k: k + n_blocks] for k in range(q)]
    if rem:
        parts.append(blocks[q: q + n_blocks, :rem])
    windows = jnp.concatenate(parts, axis=1)       # [n_blocks, Lw]
    y = jnp.matmul(windows, jnp.asarray(g),
                   precision=jax.lax.Precision.HIGHEST)
    return y.reshape(-1)[:n_out]
