"""Space-to-depth packed 1-D convolutions for small-channel TPU stages.

The MXU is a 128x128 systolic array: a conv with C in/out channels uses
only C/128 of its lanes in each dimension, so HiFi-GAN's late upsample
stages (C = 64/32/16 at full audio rate) run at a few percent MFU
(BASELINE.md round-2 analysis: the NSF-HiFiGAN stack is ~2.3 TFLOP in
~90-100 ms, ~12% MFU, and dominates fused serving latency).

Fix: pack P consecutive time samples into channels,
``[B, T, C] -> [B, T/P, P*C]``, and precompute a block-Toeplitz kernel so
each dilated conv / transposed conv becomes ONE stride-1 convolution over
blocks with >=128 effective channels (dense MXU tiles).  Packing and
repacking are plain reshapes.  The packed kernel holds structural zeros
(cost factor ~S*P/k on FLOPs) but the lane-utilization gain (128/C)^2
dominates for C <= 64: net ~10x for C=16 resblocks, ~3-5x for C=32.

Numerics are exact up to matmul accumulation order (the same multiply-adds
plus always-zero padding terms); parity vs nn.conv1d/nn.conv_transpose1d is
tested in tests/test_packed_conv.py.

No reference counterpart — TPU-native design.  The reference's vocoder
(``modules/nsf_hifigan/models.py``) leans on cuDNN's small-channel CUDA
kernels, which have no MXU analogue.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax.numpy as jnp
import numpy as np

from ..models import nn


def pack(x: jnp.ndarray, P: int) -> jnp.ndarray:
    """[B, T, C] -> [B, T//P, P*C]; block t' holds samples t'*P .. t'*P+P-1
    (channel slot p*C+c = sample phase p, channel c). Also repacks an
    already-packed tensor by a further factor P (blocks of blocks)."""
    if P == 1:
        return x
    b, t, c = x.shape
    return x.reshape(b, t // P, P * c)


def unpack(x: jnp.ndarray, P: int) -> jnp.ndarray:
    """Inverse of :func:`pack`."""
    if P == 1:
        return x
    b, t, c = x.shape
    return x.reshape(b, t * P, c // P)


# ---------------------------------------------------------------------------
# stride-1 dilated conv
# ---------------------------------------------------------------------------

def conv1d_span(k: int, dilation: int, pad: int, P: int) -> Tuple[int, int]:
    """Block-offset range [m_min, m_max] touched by a packed stride-1 conv:
    output sample phase p reads input sample p - pad + j*dilation, which
    lives in block offset floor(q / P).  Monotone in (p, j) so the corners
    suffice."""
    qs = [p - pad + j * dilation for p in (0, P - 1) for j in (0, k - 1)]
    return min(q // P for q in qs), max(q // P for q in qs)


def pack_conv1d(p: dict, P: int, dilation: int, pad: int) -> dict:
    """Precompute packed params for nn.conv1d(p, x, dilation=d, padding=pad)
    (stride 1).  p["w"] is HIO [k, C_in, C_out]."""
    if P == 1:
        return p
    w = np.asarray(p["w"])
    k, ci, co = w.shape
    m_min, m_max = conv1d_span(k, dilation, pad, P)
    wb = np.zeros((m_max - m_min + 1, P * ci, P * co), w.dtype)
    for p_out in range(P):
        for j in range(k):
            q = p_out - pad + j * dilation
            m, p_in = q // P, q % P
            wb[m - m_min, p_in * ci:(p_in + 1) * ci,
               p_out * co:(p_out + 1) * co] = w[j]
    out = {"w": jnp.asarray(wb)}
    if "b" in p:
        out["b"] = jnp.asarray(np.tile(np.asarray(p["b"]), P))
    return out


def packed_conv1d(pp: dict, x: jnp.ndarray, *, k: int, dilation: int,
                  pad: int, P: int) -> jnp.ndarray:
    """Apply params from :func:`pack_conv1d` to P-packed x [B, T/P, P*C]."""
    if P == 1:
        return nn.conv1d(pp, x, dilation=dilation, padding=pad)
    m_min, m_max = conv1d_span(k, dilation, pad, P)
    return nn.conv1d(pp, x, padding=[(-m_min, m_max)])


# ---------------------------------------------------------------------------
# transposed conv (upsample by u): packed output P_out = P_in * u keeps the
# block count constant, so the packed op is again a stride-1 conv.
# ---------------------------------------------------------------------------

def _convt_entries(k: int, u: int, pad: int, P_in: int) -> Iterator[
        Tuple[int, int, int, int]]:
    """(block offset m, input phase p_in, tap j, output phase p_out) for
    torch ConvTranspose1d(stride=u, padding=pad) semantics:
    y[t_out] += x[t_in] W[j]  where  t_out = t_in*u + j - pad."""
    p_out_n = P_in * u
    q_lo = -((k - 1 - pad) // u)          # ceil((pad - k + 1) / u)
    q_hi = (p_out_n + pad - 1) // u
    for q in range(q_lo, q_hi + 1):
        for j in range(k):
            p_out = q * u + j - pad
            if 0 <= p_out < p_out_n:
                yield q // P_in, q % P_in, j, p_out


def convt_span(k: int, u: int, pad: int, P_in: int) -> Tuple[int, int]:
    ms = [e[0] for e in _convt_entries(k, u, pad, P_in)]
    return min(ms), max(ms)


def pack_conv_transpose(p: dict, P_in: int, u: int, pad: int) -> dict:
    """Precompute packed params for nn.conv_transpose1d(p, x, stride=u,
    padding=pad).  p["w"] is [k, C_out, C_in] (transpose_kernel layout);
    the result is a stride-1 conv kernel [S, P_in*C_in, P_in*u*C_out]."""
    w = np.asarray(p["w"])
    k, co, ci = w.shape
    m_min, m_max = convt_span(k, u, pad, P_in)
    p_out_n = P_in * u
    wb = np.zeros((m_max - m_min + 1, P_in * ci, p_out_n * co), w.dtype)
    for m, p_in, j, p_out in _convt_entries(k, u, pad, P_in):
        wb[m - m_min, p_in * ci:(p_in + 1) * ci,
           p_out * co:(p_out + 1) * co] = w[j].T
    out = {"w": jnp.asarray(wb)}
    if "b" in p:
        out["b"] = jnp.asarray(np.tile(np.asarray(p["b"]), p_out_n))
    return out


def packed_conv_transpose(pp: dict, x: jnp.ndarray, *, k: int, u: int,
                          pad: int, P_in: int) -> jnp.ndarray:
    """Apply params from :func:`pack_conv_transpose` to P_in-packed x;
    returns (P_in*u)-packed output with the same block count."""
    m_min, m_max = convt_span(k, u, pad, P_in)
    return nn.conv1d(pp, x, padding=[(-m_min, m_max)])


# ---------------------------------------------------------------------------
# strided downsampling conv from a 1-channel signal (the NSF noise_convs):
# out[t, c] = sum_j x[t*s + j - pad] w[j, c].  Packing P outputs per block
# consumes input in blocks of D = P*s, so the packed op is again a stride-1
# conv — x_source lands DIRECTLY in the P-packed layout (the unpacked
# [T_i, C<128] intermediate plus its pack() relayout never materialize).
# ---------------------------------------------------------------------------

def _strided_entries(k: int, s: int, pad: int, P: int) -> Iterator[
        Tuple[int, int, int, int]]:
    """(block offset m, input slot r, tap j, output phase p)."""
    d = P * s
    for p in range(P):
        for j in range(k):
            q = p * s + j - pad
            yield q // d, q % d, j, p


def strided_span(k: int, s: int, pad: int, P: int) -> Tuple[int, int]:
    ms = [e[0] for e in _strided_entries(k, s, pad, P)]
    return min(ms), max(ms)


def pack_strided_conv(p: dict, P: int, s: int) -> dict:
    """Precompute packed params for the NSF noise conv
    ``nn.conv1d(p, har, stride=s, padding=s//2)`` (k = 2s) or the k == 1
    variant ``nn.conv1d(p, har)``; p["w"] is [k, 1, C]."""
    w = np.asarray(p["w"])
    k, _, c = w.shape
    pad = s // 2 if k > 1 else 0
    d = P * s
    m_min, m_max = strided_span(k, s, pad, P)
    wb = np.zeros((m_max - m_min + 1, d, P * c), w.dtype)
    for m, r, j, pp in _strided_entries(k, s, pad, P):
        wb[m - m_min, r, pp * c:(pp + 1) * c] += w[j, 0]
    out = {"w": jnp.asarray(wb)}
    if "b" in p:
        out["b"] = jnp.asarray(np.tile(np.asarray(p["b"]), P))
    return out


def packed_strided_conv(pp: dict, har: jnp.ndarray, *, k: int, s: int,
                        P: int) -> jnp.ndarray:
    """Apply :func:`pack_strided_conv` params to har [B, L, 1]; returns the
    P-packed x_source [B, L/(P*s), P*C]."""
    pad = s // 2 if k > 1 else 0
    m_min, m_max = strided_span(k, s, pad, P)
    b, L, _ = har.shape
    d = P * s
    hb = har[:, : (L // d) * d, 0].reshape(b, L // d, d)
    return nn.conv1d(pp, hb, padding=[(-m_min, m_max)])
