"""HuBERT-soft content encoder in JAX (+ torch checkpoint converter).

Parity target: reference ``network/hubert/hubert_model.py:16-247`` —
7-conv feature extractor (320x downsample), layer-norm + 512->768
projection, grouped conv positional embedding (k=128, 16 groups, weight-norm
dim=2), 12-layer post-LN transformer (768 d, 12 heads, 3072 FFN, gelu), and
the 768->256 soft-unit projection. ``units()`` pads the 16 kHz waveform by
(400-320)/2 on both sides.

TPU notes: the conv frontend is seven strided convs — XLA maps them to MXU
convolutions; attention over unit frames (50 Hz) is tiny. The whole
``units`` path is one jittable function, bucketed by waveform length.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nn


class HubertConfig(NamedTuple):
    dim: int = 768
    num_heads: int = 12
    num_layers: int = 12
    ffn_dim: int = 3072
    proj_dim: int = 256


CONV_SPECS = [  # (kernel, stride)
    (10, 5), (3, 2), (3, 2), (3, 2), (3, 2), (2, 2), (2, 2)]


def init(key, cfg: HubertConfig = HubertConfig()):
    keys = iter(jax.random.split(key, 256))
    fe = {"conv0": nn.init_conv1d(next(keys), 10, 1, 512, bias=False),
          "norm0": nn.init_group_norm(512, 512)}
    for i in range(1, 7):
        k, _ = CONV_SPECS[i]
        fe[f"conv{i}"] = nn.init_conv1d(next(keys), k, 512, 512, bias=False)
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "attn": {
                "q": nn.init_linear(next(keys), cfg.dim, cfg.dim),
                "k": nn.init_linear(next(keys), cfg.dim, cfg.dim),
                "v": nn.init_linear(next(keys), cfg.dim, cfg.dim),
                "out": nn.init_linear(next(keys), cfg.dim, cfg.dim),
            },
            "ln1": nn.init_layer_norm(cfg.dim),
            "ffn": {"w1": nn.init_linear(next(keys), cfg.dim, cfg.ffn_dim),
                    "w2": nn.init_linear(next(keys), cfg.ffn_dim, cfg.dim)},
            "ln2": nn.init_layer_norm(cfg.dim),
        })
    return {
        "feature_extractor": fe,
        "feature_projection": {"norm": nn.init_layer_norm(512),
                               "projection": nn.init_linear(next(keys), 512, cfg.dim)},
        "positional_embedding": {"conv": nn.init_conv1d(next(keys), 128, cfg.dim // 16, cfg.dim)},
        "norm": nn.init_layer_norm(cfg.dim),
        "encoder": layers,
        "proj": nn.init_linear(next(keys), cfg.dim, cfg.proj_dim),
    }


def feature_extractor(p, x):
    """x: [B, L] 16 kHz wav -> [B, T, 512] at 50 Hz (320x downsample)."""
    x = x[:, :, None]
    x = nn.conv1d(p["conv0"], x, stride=5, padding=0)
    x = nn.group_norm(p["norm0"], x, num_groups=512)
    x = jax.nn.gelu(x, approximate=False)
    for i in range(1, 7):
        k, s = CONV_SPECS[i]
        x = nn.conv1d(p[f"conv{i}"], x, stride=s, padding=0)
        x = jax.nn.gelu(x, approximate=False)
    return x


def positional_conv(p, x):
    """Grouped conv positional embedding; drops the last output frame."""
    y = nn.conv1d(p["conv"], x, padding=64, groups=16)
    y = y[:, :-1, :]
    return jax.nn.gelu(y, approximate=False)


def _torch_mha(p, x, num_heads: int):
    """torch MultiheadAttention (packed qkv with bias, out bias)."""
    b, t, c = x.shape
    hd = c // num_heads
    q = nn.linear(p["q"], x).reshape(b, t, num_heads, hd)
    k = nn.linear(p["k"], x).reshape(b, t, num_heads, hd)
    v = nn.linear(p["v"], x).reshape(b, t, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, c)
    return nn.linear(p["out"], out)


def encoder_layer(p, x, num_heads: int):
    """torch TransformerEncoderLayer, post-LN (norm_first=False)."""
    x = nn.layer_norm(p["ln1"], x + _torch_mha(p["attn"], x, num_heads))
    h = nn.linear(p["ffn"]["w1"], x)
    h = jax.nn.gelu(h, approximate=False)
    h = nn.linear(p["ffn"]["w2"], h)
    x = nn.layer_norm(p["ln2"], x + h)
    return x


def encode(params, cfg: HubertConfig, wav16k, output_layer=None):
    """wav16k: [B, L] -> [B, T, 768] encoder features."""
    x = feature_extractor(params["feature_extractor"], wav16k)
    x = nn.layer_norm(params["feature_projection"]["norm"], x)
    x = nn.linear(params["feature_projection"]["projection"], x)
    x = x + positional_conv(params["positional_embedding"], x)
    x = nn.layer_norm(params["norm"], x)
    for layer in params["encoder"][:output_layer]:
        x = encoder_layer(layer, x, cfg.num_heads)
    return x


@functools.partial(jax.jit, static_argnames=("cfg",))
def units(params, cfg: HubertConfig, wav16k):
    """HuBERT-soft units: [B, L] 16 kHz wav -> [B, T, 256]."""
    pad = (400 - 320) // 2
    wav16k = jnp.pad(wav16k, ((0, 0), (pad, pad)))
    x = encode(params, cfg, wav16k)
    return nn.linear(params["proj"], x)


# ---------------------------------------------------------------------------
# Converter from the reference hubert_soft.pt state dict
# ---------------------------------------------------------------------------

def convert(sd: Dict[str, np.ndarray], cfg: HubertConfig = HubertConfig()) -> Dict:
    from ..utils import convert_torch as cvt

    sd = cvt.fold_weight_norm(sd)
    fe = {"conv0": cvt.conv1d(sd, "feature_extractor.conv0", bias=False),
          "norm0": {"scale": sd["feature_extractor.norm0.weight"].astype(np.float32),
                    "bias": sd["feature_extractor.norm0.bias"].astype(np.float32)}}
    for i in range(1, 7):
        fe[f"conv{i}"] = cvt.conv1d(sd, f"feature_extractor.conv{i}", bias=False)

    layers = []
    for i in range(cfg.num_layers):
        pfx = f"encoder.layers.{i}"
        in_w = sd[f"{pfx}.self_attn.in_proj_weight"]
        in_b = sd[f"{pfx}.self_attn.in_proj_bias"]
        d = cfg.dim
        layers.append({
            "attn": {
                "q": {"w": in_w[:d].T.astype(np.float32), "b": in_b[:d].astype(np.float32)},
                "k": {"w": in_w[d:2*d].T.astype(np.float32), "b": in_b[d:2*d].astype(np.float32)},
                "v": {"w": in_w[2*d:].T.astype(np.float32), "b": in_b[2*d:].astype(np.float32)},
                "out": cvt.linear(sd, f"{pfx}.self_attn.out_proj"),
            },
            "ln1": cvt.layer_norm(sd, f"{pfx}.norm1"),
            "ffn": {"w1": cvt.linear(sd, f"{pfx}.linear1"),
                    "w2": cvt.linear(sd, f"{pfx}.linear2")},
            "ln2": cvt.layer_norm(sd, f"{pfx}.norm2"),
        })
    return {
        "feature_extractor": fe,
        "feature_projection": {
            "norm": cvt.layer_norm(sd, "feature_projection.norm"),
            "projection": cvt.linear(sd, "feature_projection.projection")},
        "positional_embedding": {"conv": cvt.conv1d(sd, "positional_embedding.conv")},
        "norm": cvt.layer_norm(sd, "norm"),
        "encoder": layers,
        "proj": cvt.linear(sd, "proj"),
    }


def load(pt_path: str, cfg: HubertConfig = HubertConfig()):
    from ..utils import convert_torch as cvt

    ckpt = cvt.torch_load(pt_path)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k[len("module."):] if k.startswith("module.") else k: cvt._to_np(v)
          for k, v in sd.items()}
    return convert(sd, cfg)
