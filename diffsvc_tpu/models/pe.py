"""PitchExtractor ("pe"): mel -> (f0, uv) CNN, used at inference to
re-extract f0 from the *generated* mel for the vocoder (24 kHz path).

Parity target: reference ``modules/fastspeech/pe.py`` — 3-layer conv Prenet
(k5, BatchNorm), 2 residual ConvStacks blocks (k5, GroupNorm 16-ch groups),
and a 5-layer PitchPredictor head (k5, channel-LayerNorm, sinusoidal
positions with learned alpha) producing [f0_norm, uv-logit].
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nn
from ..ops.pitch import denorm_f0


class PEConfig(NamedTuple):
    n_mel_bins: int = 80
    hidden_size: int = 256
    predictor_hidden: int = 256
    conv_layers: int = 2
    predictor_kernel: int = 5
    pitch_type: str = "frame"
    use_uv: bool = False
    pitch_norm: str = "log"
    f0_mean: float = 0.0
    f0_std: float = 1.0

    @classmethod
    def from_hparams(cls, hp):
        h = int(hp["hidden_size"])
        ph = int(hp.get("predictor_hidden", -1))
        return cls(
            n_mel_bins=int(hp["audio_num_mel_bins"]),
            hidden_size=h,
            predictor_hidden=ph if ph > 0 else h,
            predictor_kernel=int(hp.get("predictor_kernel", 5)),
            pitch_type=hp.get("pitch_type", "frame"),
            use_uv=bool(hp.get("use_uv", False)),
            pitch_norm=hp.get("pitch_norm", "log"),
            f0_mean=float(hp.get("f0_mean", 0.0) or 0.0),
            f0_std=float(hp.get("f0_std", 1.0) or 1.0),
        )


def batch_norm_eval(p, x):
    """BatchNorm1d at inference: running stats. x: [B, T, C]."""
    inv = jax.lax.rsqrt(p["var"] + 1e-5)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def init(key, cfg: PEConfig):
    keys = iter(jax.random.split(key, 32))
    h = cfg.hidden_size
    prenet_layers = []
    c_in = cfg.n_mel_bins
    for _ in range(3):
        prenet_layers.append({
            "conv": nn.init_conv1d(next(keys), 5, c_in, h),
            "bn": {"scale": jnp.ones((h,)), "bias": jnp.zeros((h,)),
                   "mean": jnp.zeros((h,)), "var": jnp.ones((h,))},
        })
        c_in = h
    stacks = {"in_proj": nn.init_linear(next(keys), h, h),
              "blocks": [], "out_proj": nn.init_linear(next(keys), h, h)}
    for _ in range(cfg.conv_layers):
        stacks["blocks"].append({
            "conv": nn.init_conv1d(next(keys), 5, h, h),
            "gn": nn.init_group_norm(h // 16, h),
        })
    pred_layers = []
    c_in = h
    for _ in range(5):
        pred_layers.append({
            "conv": nn.init_conv1d(next(keys), cfg.predictor_kernel, c_in, cfg.predictor_hidden),
            "ln": nn.init_layer_norm(cfg.predictor_hidden),
        })
        c_in = cfg.predictor_hidden
    return {
        "mel_prenet": {"layers": prenet_layers,
                       "out_proj": nn.init_linear(next(keys), h, h)},
        "mel_encoder": stacks,
        "pitch_predictor": {"layers": pred_layers,
                            "linear": nn.init_linear(next(keys), cfg.predictor_hidden, 2),
                            "pos_embed_alpha": jnp.ones((1,))},
    }


def apply(params, cfg: PEConfig, mel):
    """mel: [B, T, M] -> dict(pitch_pred [B, T, 2], f0_denorm_pred [B, T])."""
    padding_mask = jnp.abs(mel).sum(-1) == 0
    nonpadding = 1.0 - padding_mask.astype(mel.dtype)[:, :, None]

    # Prenet
    x = mel
    for lp in params["mel_prenet"]["layers"]:
        x = nn.conv1d(lp["conv"], x, padding=2)
        x = jax.nn.relu(x)
        x = batch_norm_eval(lp["bn"], x)
        x = x * nonpadding
    x = nn.linear(params["mel_prenet"]["out_proj"], x) * nonpadding

    # ConvStacks (residual)
    enc = params["mel_encoder"]
    x = nn.linear(enc["in_proj"], x)
    for blk in enc["blocks"]:
        y = nn.conv1d(blk["conv"], x, padding=2)
        y = nn.group_norm(blk["gn"], y, num_groups=cfg.hidden_size // 16)
        y = jax.nn.relu(y)
        x = x + y
    x = nn.linear(enc["out_proj"], x)

    # PitchPredictor head (sinusoidal positions scaled by learned alpha)
    pp = params["pitch_predictor"]
    pos = nn.sinusoidal_positional_embedding(x.shape[1], x.shape[2], offset=1)
    x = x + pp["pos_embed_alpha"][0] * pos[None]
    for lp in pp["layers"]:
        x = nn.conv1d(lp["conv"], x, padding=(cfg.predictor_kernel - 1) // 2)
        x = jax.nn.relu(x)
        x = nn.layer_norm(lp["ln"], x)
    pitch_pred = nn.linear(pp["linear"], x)  # [B, T, 2]

    uv = (pitch_pred[:, :, 1] > 0) if cfg.pitch_type == "frame" else None
    f0_denorm = denorm_f0(pitch_pred[:, :, 0], uv, pitch_norm=cfg.pitch_norm,
                          use_uv=cfg.use_uv, pitch_padding=padding_mask,
                          f0_mean=cfg.f0_mean, f0_std=cfg.f0_std)
    return {"pitch_pred": pitch_pred, "f0_denorm_pred": f0_denorm}


def convert(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference pe checkpoint state dict -> params pytree."""
    from ..utils import convert_torch as cvt

    prenet_layers = []
    for i in range(3):
        pfx = f"mel_prenet.layers.{i}"
        prenet_layers.append({
            "conv": cvt.conv1d(sd, f"{pfx}.0"),
            "bn": {"scale": sd[f"{pfx}.2.weight"].astype(np.float32),
                   "bias": sd[f"{pfx}.2.bias"].astype(np.float32),
                   "mean": sd[f"{pfx}.2.running_mean"].astype(np.float32),
                   "var": sd[f"{pfx}.2.running_var"].astype(np.float32)},
        })
    blocks = []
    i = 0
    while f"mel_encoder.conv.{i}.conv.conv.weight" in sd:
        blocks.append({
            "conv": cvt.conv1d(sd, f"mel_encoder.conv.{i}.conv.conv"),
            "gn": {"scale": sd[f"mel_encoder.conv.{i}.norm.weight"].astype(np.float32),
                   "bias": sd[f"mel_encoder.conv.{i}.norm.bias"].astype(np.float32)},
        })
        i += 1
    pred_layers = []
    for i in range(5):
        pfx = f"pitch_predictor.conv.{i}"
        pred_layers.append({
            "conv": cvt.conv1d(sd, f"{pfx}.1"),
            "ln": {"scale": sd[f"{pfx}.3.weight"].astype(np.float32),
                   "bias": sd[f"{pfx}.3.bias"].astype(np.float32)},
        })
    return {
        "mel_prenet": {"layers": prenet_layers,
                       "out_proj": cvt.linear(sd, "mel_prenet.out_proj")},
        "mel_encoder": {"in_proj": cvt.linear(sd, "mel_encoder.in_proj"),
                        "blocks": blocks,
                        "out_proj": cvt.linear(sd, "mel_encoder.out_proj")},
        "pitch_predictor": {"layers": pred_layers,
                            "linear": cvt.linear(sd, "pitch_predictor.linear"),
                            "pos_embed_alpha": sd["pitch_predictor.pos_embed_alpha"].astype(np.float32)},
    }
