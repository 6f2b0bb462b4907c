"""FastSpeech transformer stack: FFT blocks, predictors, length regulator.

Parity targets: reference ``modules/fastspeech/tts_modules.py`` and
``modules/commons/common_layers.py`` (EncSALayer: pre-LN self-attention with
bias-free in/out projections + conv-FFN with ``kernel_size**-0.5`` scaling
and GELU). Used by the optional ``no_fs2: false`` path, the FFT diffusion
decoder, and the pitch-extractor/predictor heads.

TPU notes: attention is a straight QK^T softmax V in [B, T, C] — sequence
lengths here are mel-frame counts (hundreds to a few thousand), so flash-
style tiling is unnecessary; XLA fuses the masked softmax. All params are
plain pytrees.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import nn

DEFAULT_MAX_TARGET_POSITIONS = 2000


def positional_encoding_for(x, offset: int = 1):
    """fairseq-style sinusoidal positions for [B, T, C] (non-padding aware
    variant; callers multiply by nonpadding masks as the reference does)."""
    return nn.sinusoidal_positional_embedding(x.shape[1], x.shape[2], offset)[None]


def init_mha(key, dim: int, bias: bool = False):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # fairseq MultiheadAttention: in_proj (3C) with xavier_uniform/sqrt2, out xavier
    std = math.sqrt(2.0 / (dim + dim)) / math.sqrt(2.0)
    p = {
        "q": {"w": jax.random.normal(k1, (dim, dim)) * std},
        "k": {"w": jax.random.normal(k2, (dim, dim)) * std},
        "v": {"w": jax.random.normal(k3, (dim, dim)) * std},
        "out": {"w": jax.random.normal(k4, (dim, dim)) * math.sqrt(2.0 / (dim + dim))},
    }
    return p


def mha(p, x, num_heads: int, key_padding_mask=None, attn_mask=None):
    """Multi-head self-attention on [B, T, C]."""
    b, t, c = x.shape
    hd = c // num_heads
    q = nn.linear(p["q"], x).reshape(b, t, num_heads, hd)
    k = nn.linear(p["k"], x).reshape(b, t, num_heads, hd)
    v = nn.linear(p["v"], x).reshape(b, t, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], -1e9, logits)
    if attn_mask is not None:
        logits = logits + attn_mask
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, c)
    return nn.linear(p["out"], out)


def init_ffn(key, dim: int, kernel_size: int):
    k1, k2 = jax.random.split(key)
    return {
        "conv": nn.init_conv1d(k1, kernel_size, dim, 4 * dim),
        "out": nn.init_linear(k2, 4 * dim, dim),
    }


def _dropout(x, rate: float, rng):
    if rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def ffn(p, x, kernel_size: int, act: str = "gelu", dropout: float = 0.0,
        rng=None):
    y = nn.conv1d(p["conv"], x, padding=kernel_size // 2)
    # torch Conv1d(padding=k//2) with even k yields T+1 outputs; torch keeps
    # them all but the reference always uses odd kernels (9). Guard anyway.
    y = y[:, : x.shape[1]]
    y = y * kernel_size**-0.5
    if act == "gelu":
        y = jax.nn.gelu(y)
    elif act == "relu":
        y = jax.nn.relu(y)
    # reference relu_dropout inside TransformerFFNLayer (common_layers.py:523)
    y = _dropout(y, dropout, rng)
    return nn.linear(p["out"], y)


def init_enc_layer(key, dim: int, kernel_size: int):
    k1, k2 = jax.random.split(key)
    return {
        "ln1": nn.init_layer_norm(dim),
        "attn": init_mha(k1, dim),
        "ln2": nn.init_layer_norm(dim),
        "ffn": init_ffn(k2, dim, kernel_size),
    }


def apply_enc_layer(p, x, num_heads, kernel_size, padding_mask, dropout=0.0,
                    rng=None, relu_dropout=0.1):
    """Pre-LN transformer block (reference EncSALayer,
    common_layers.py:545-592): dropout after attention and after the FFN at
    ``dropout``, plus the FFN-internal relu_dropout (0.1 in the reference).
    Inference passes dropout=0 / rng=None -> deterministic."""
    if rng is not None:
        r1, r2, r3 = jax.random.split(rng, 3)
    else:
        r1 = r2 = r3 = None
    nonpadding = 1.0 - padding_mask.astype(x.dtype)[:, :, None]
    res = x
    y = nn.layer_norm(p["ln1"], x)
    y = mha(p["attn"], y, num_heads, key_padding_mask=padding_mask)
    y = _dropout(y, dropout, r1)
    x = (res + y) * nonpadding
    res = x
    y = nn.layer_norm(p["ln2"], x)
    y = ffn(p["ffn"], y, kernel_size,
            dropout=relu_dropout if dropout > 0.0 else 0.0, rng=r2)
    y = _dropout(y, dropout, r3)
    x = (res + y) * nonpadding
    return x


def init_fft_blocks(key, dim: int, num_layers: int, kernel_size: int,
                    num_heads: int, use_last_norm: bool = True):
    keys = jax.random.split(key, num_layers + 1)
    p = {"layers": [init_enc_layer(keys[i], dim, kernel_size) for i in range(num_layers)]}
    if use_last_norm:
        p["ln"] = nn.init_layer_norm(dim)
    return p


def apply_fft_blocks(p, x, padding_mask, num_heads, kernel_size, dropout=0.0, rng=None):
    nonpadding = 1.0 - padding_mask.astype(x.dtype)[:, :, None]
    x = x * nonpadding
    for i, lp in enumerate(p["layers"]):
        lrng = jax.random.fold_in(rng, i) if rng is not None else None
        x = apply_enc_layer(lp, x, num_heads, kernel_size, padding_mask,
                            dropout, lrng)
    if "ln" in p:
        x = nn.layer_norm(p["ln"], x) * nonpadding
    return x


# ---------------------------------------------------------------------------
# Predictors (duration / pitch / energy) — reference tts_modules.py:59-239
# ---------------------------------------------------------------------------

def init_predictor(key, idim: int, n_chans: int, n_layers: int,
                   kernel_size: int, odim: int):
    keys = jax.random.split(key, n_layers + 1)
    layers = []
    for i in range(n_layers):
        c_in = idim if i == 0 else n_chans
        layers.append({
            "conv": nn.init_conv1d(keys[i], kernel_size, c_in, n_chans),
            "ln": nn.init_layer_norm(n_chans),
        })
    return {"layers": layers, "out": nn.init_linear(keys[-1], n_chans, odim)}


def apply_predictor(p, x, kernel_size: int, padding: str = "SAME"):
    """Conv -> ReLU -> LayerNorm stack + linear head. x: [B, T, C]."""
    for lp in p["layers"]:
        if padding == "SAME":
            y = nn.conv1d(lp["conv"], x, padding=(kernel_size - 1) // 2)
        else:  # LEFT
            k = lp["conv"]["w"].shape[0]
            xpad = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
            y = nn.conv1d(lp["conv"], xpad, padding=0)
        y = y[:, : x.shape[1]]
        y = jax.nn.relu(y)
        x = nn.layer_norm(lp["ln"], y)
    return nn.linear(p["out"], x)


def length_regulator(dur, max_len: int):
    """Expand durations [B, T_ph] -> mel2ph [B, max_len] (1-based, 0=pad)."""
    end = jnp.cumsum(dur, axis=1)
    start = end - dur
    pos = jnp.arange(max_len)[None, :, None]
    inside = (pos >= start[:, None, :]) & (pos < end[:, None, :])
    mel2ph = (inside * (jnp.arange(dur.shape[1])[None, None, :] + 1)).sum(-1)
    return mel2ph


def mel2ph_to_dur(mel2ph, T_txt: int):
    """Counts per phone (reference tts_modules.py:242-248)."""
    b = mel2ph.shape[0]
    dur = jnp.zeros((b, T_txt + 1), dtype=jnp.int32)
    ones = jnp.ones_like(mel2ph)
    dur = jax.vmap(lambda d, m, o: d.at[m].add(o))(dur, mel2ph, ones)
    return dur[:, 1:]
