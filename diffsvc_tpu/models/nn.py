"""Functional NN primitives (pure pytree params, channels-last layout).

Everything is ``init_*(key, ...) -> params`` + ``apply(params, x) -> y``.
Convolutions use [B, T, C] (NHC) layout — the lane dimension carries
channels, which maps naturally onto the TPU's (8,128) vector registers and
lets XLA tile the implied matmuls onto the MXU.

Torch-compatible weight storage conventions (for checkpoint converters):
- Conv1d kernels are stored HIO ``[k, in, out]`` (torch is ``[out, in, k]``),
- Linear weights are stored ``[in, out]`` (torch is ``[out, in]``).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Initializers (torch-parity where the reference relies on them)
# ---------------------------------------------------------------------------

def kaiming_normal_conv(key, k: int, c_in: int, c_out: int, groups: int = 1):
    """nn.init.kaiming_normal_ (fan_in, relu gain) as used by DiffNet convs."""
    fan_in = (c_in // groups) * k
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, (k, c_in // groups, c_out)) * std


def torch_conv_default(key, k: int, c_in: int, c_out: int, groups: int = 1):
    """torch Conv1d default: kaiming_uniform(a=sqrt(5)) == U(-b, b),
    b = 1/sqrt(fan_in)."""
    fan_in = (c_in // groups) * k
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, (k, c_in // groups, c_out), minval=-bound, maxval=bound)


def torch_linear_default(key, c_in: int, c_out: int):
    bound = 1.0 / math.sqrt(c_in)
    return jax.random.uniform(key, (c_in, c_out), minval=-bound, maxval=bound)


def normal_embedding(key, n: int, dim: int, padding_idx: Optional[int] = None):
    """nn.Embedding-style init: N(0, 1) scaled to N(0, d^-0.5) as the
    reference's Embedding helper does (common_layers.py:28-33)."""
    emb = jax.random.normal(key, (n, dim)) * (dim**-0.5)
    if padding_idx is not None:
        emb = emb.at[padding_idx].set(0.0)
    return emb


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

def init_linear(key, c_in: int, c_out: int, bias: bool = True, zero: bool = False):
    wk, bk = jax.random.split(key)
    w = jnp.zeros((c_in, c_out)) if zero else torch_linear_default(wk, c_in, c_out)
    p = {"w": w}
    if bias:
        bound = 1.0 / math.sqrt(c_in)
        p["b"] = jnp.zeros((c_out,)) if zero else jax.random.uniform(
            bk, (c_out,), minval=-bound, maxval=bound)
    return p


def linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def init_conv1d(key, k: int, c_in: int, c_out: int, bias: bool = True,
                init: str = "torch", groups: int = 1):
    wk, bk = jax.random.split(key)
    if init == "kaiming_normal":
        w = kaiming_normal_conv(wk, k, c_in, c_out, groups)
    elif init == "zero":
        w = jnp.zeros((k, c_in // groups, c_out))
    else:
        w = torch_conv_default(wk, k, c_in, c_out, groups)
    p = {"w": w}
    if bias:
        fan_in = (c_in // groups) * k
        bound = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(bk, (c_out,), minval=-bound, maxval=bound) \
            if init != "zero" else jnp.zeros((c_out,))
    return p


def conv1d(p, x, *, dilation: int = 1, stride: int = 1, padding="SAME",
           groups: int = 1):
    """1-D convolution on [B, T, C] with HIO kernel [k, in/g, out]."""
    k = p["w"].shape[0]
    if padding == "SAME":
        # torch-style symmetric padding = dilation*(k-1)//2 each side
        pad = dilation * (k - 1) // 2
        padding = [(pad, dilation * (k - 1) - pad)]
    elif isinstance(padding, int):
        padding = [(padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding=padding,
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups)
    if "b" in p:
        y = y + p["b"]
    return y


def init_conv_transpose1d(key, k: int, c_in: int, c_out: int, stride: int,
                          bias: bool = True):
    wk, bk = jax.random.split(key)
    # Stored [k, c_out, c_in]: the forward-conv (HIO) layout that
    # lax.conv_transpose(transpose_kernel=True) expects.
    fan_in = c_in * k
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": jax.random.uniform(wk, (k, c_out, c_in), minval=-bound, maxval=bound)}
    if bias:
        p["b"] = jax.random.uniform(bk, (c_out,), minval=-bound, maxval=bound)
    return p


def conv_transpose1d(p, x, *, stride: int, padding: int = 0):
    """torch-semantics ConvTranspose1d on [B, T, C]:
    out_len = (T-1)*stride - 2*padding + k."""
    k = p["w"].shape[0]
    # lax.conv_transpose with explicit padding (k-1-p, k-1-p) reproduces
    # torch's output when transpose_kernel=True handles the flip.
    y = jax.lax.conv_transpose(
        x, p["w"], strides=(stride,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        dimension_numbers=("NHC", "HIO", "NHC"), transpose_kernel=True)
    if "b" in p:
        y = y + p["b"]
    return y


def init_layer_norm(dim: int):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm(p, x, eps: float = 1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def init_group_norm(num_groups: int, dim: int):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def group_norm(p, x, num_groups: int, eps: float = 1e-5):
    """GroupNorm over channel groups, [B, T, C]."""
    b, t, c = x.shape
    xg = x.reshape(b, t, num_groups, c // num_groups)
    mean = xg.mean((1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean((1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(b, t, c) * p["scale"] + p["bias"]


def embedding(table, ids):
    return jnp.take(table, ids, axis=0)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def sinusoidal_pos_emb(t, dim: int):
    """DiffNet's diffusion-step embedding (reference net.py:32-44)."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half) * -emb)
    args = t[..., None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def sinusoidal_positional_embedding(length: int, dim: int, offset: int = 1):
    """fairseq-style sinusoidal table used by the transformer stack
    (common_layers.py:88-147): concatenated [sin | cos] halves (fairseq
    get_embedding layout — NOT interleaved) with padding_idx shift."""
    half_dim = dim // 2
    emb = math.log(10000.0) / (half_dim - 1)
    emb = np.exp(np.arange(half_dim, dtype=np.float64) * -emb)
    pos = np.arange(offset, length + offset, dtype=np.float64)
    emb = pos[:, None] * emb[None, :]
    out = np.concatenate([np.sin(emb), np.cos(emb)], axis=1)
    if dim % 2 == 1:
        out = np.concatenate([out, np.zeros((length, 1))], axis=1)
    return jnp.asarray(out.astype(np.float32))
