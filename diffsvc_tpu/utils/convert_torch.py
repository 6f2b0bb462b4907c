"""Reference-checkpoint converters: torch state dicts -> JAX pytrees.

Weights are the compatibility surface with the reference ecosystem
(SURVEY.md §5.4): community ``.ckpt`` files for the diffusion model, pe,
HiFi-GAN, NSF-HiFiGAAN and HuBERT-soft load here. torch (CPU build) is used
only to unpickle; all tensors become numpy immediately.

Conventions (see models/nn.py):
- Linear  torch [out, in]        -> ours [in, out]
- Conv1d  torch [out, in, k]     -> ours HIO [k, in, out]
- ConvT1d torch [in, out, k]     -> ours [k, in, out] (transpose_kernel)
- weight-norm (weight_g/weight_v) is folded: w = g * v / ||v||_dim0
"""

from __future__ import annotations

import glob
import os
import re
from typing import Dict

import numpy as np


def _to_np(t):
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def torch_load(path: str) -> Dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def fold_weight_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold weight_g/weight_v pairs into plain 'weight' entries."""
    out = {}
    for k, v in sd.items():
        if k.endswith("weight_g"):
            continue
        if k.endswith("weight_v"):
            base = k[: -len("weight_v")]
            g = _to_np(sd[base + "weight_g"]).astype(np.float64)
            vv = _to_np(v).astype(np.float64)
            # the norm runs over every axis where g is broadcast (size 1),
            # which covers both dim=0 (standard) and dim=2 (hubert pos-conv)
            axes = tuple(i for i in range(vv.ndim) if i >= g.ndim or g.shape[i] == 1)
            norm = np.sqrt((vv**2).sum(axis=axes, keepdims=True))
            out[base + "weight"] = (g * vv / np.maximum(norm, 1e-12)).astype(np.float32)
        else:
            out[k] = _to_np(v)
    return out


def linear(sd, prefix, bias=True):
    p = {"w": sd[f"{prefix}.weight"].T.astype(np.float32)}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"].astype(np.float32)
    return p


def conv1d(sd, prefix, bias=True):
    p = {"w": sd[f"{prefix}.weight"].transpose(2, 1, 0).astype(np.float32)}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"].astype(np.float32)
    return p


def conv_transpose1d(sd, prefix, bias=True):
    # torch [in, out, k] -> [k, out, in] (forward-conv HIO for transpose_kernel)
    p = {"w": sd[f"{prefix}.weight"].transpose(2, 1, 0).astype(np.float32)}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"].astype(np.float32)
    return p


def layer_norm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"].astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32)}


def strip_prefix(sd: Dict, prefix: str) -> Dict:
    pl = len(prefix)
    return {k[pl:]: v for k, v in sd.items() if k.startswith(prefix)}


def load_ckpt_state_dict(ckpt_path: str, prefix: str = "model.") -> Dict[str, np.ndarray]:
    """Load a reference trainer checkpoint and return the numpy state dict of
    the inner model (mirrors ``utils.load_ckpt``: strips the 'model.' prefix).
    Accepts a directory (globs latest ``model_ckpt_steps_*.ckpt``)."""
    if os.path.isdir(ckpt_path):
        cands = glob.glob(os.path.join(ckpt_path, "model_ckpt_steps_*.ckpt"))
        assert cands, f"no checkpoints in {ckpt_path}"
        ckpt_path = max(cands, key=lambda x: int(re.findall(r"steps_(\d+)", x)[0]))
    ckpt = torch_load(ckpt_path)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: _to_np(v) for k, v in sd.items()}
    if prefix and any(k.startswith(prefix) for k in sd):
        sd = strip_prefix(sd, prefix)
    return sd


# ---------------------------------------------------------------------------
# DiffNet (reference network/diff/net.py:85-135)
# ---------------------------------------------------------------------------

def convert_diffnet(sd: Dict, n_layers: int) -> Dict:
    layers = []
    for i in range(n_layers):
        pfx = f"residual_layers.{i}"
        layers.append({
            "dilated_conv": conv1d(sd, f"{pfx}.dilated_conv"),
            "diffusion_projection": linear(sd, f"{pfx}.diffusion_projection"),
            "conditioner_projection": conv1d(sd, f"{pfx}.conditioner_projection"),
            "output_projection": conv1d(sd, f"{pfx}.output_projection"),
        })
    import jax.numpy as jnp
    import jax

    stacked = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *layers)
    return {
        "input_projection": conv1d(sd, "input_projection"),
        "mlp": {"w1": linear(sd, "mlp.0"), "w2": linear(sd, "mlp.2")},
        "layers": stacked,
        "skip_projection": conv1d(sd, "skip_projection"),
        "output_projection": conv1d(sd, "output_projection"),
    }


# ---------------------------------------------------------------------------
# FS2 condition encoder (reference modules/fastspeech/fs2.py)
# ---------------------------------------------------------------------------

def convert_fs2(sd: Dict, cfg) -> Dict:
    p = {"mel_out": linear(sd, "mel_out")}
    if cfg.use_pitch_embed and "pitch_embed.weight" in sd:
        p["pitch_embed"] = sd["pitch_embed.weight"].astype(np.float32)
    if cfg.use_energy_embed and "energy_embed.weight" in sd:
        p["energy_embed"] = sd["energy_embed.weight"].astype(np.float32)
    if "spk_embed_proj.weight" in sd:
        if cfg.use_spk_id:
            p["spk_embed_proj"] = sd["spk_embed_proj.weight"].astype(np.float32)
        else:
            p["spk_embed_proj"] = linear(sd, "spk_embed_proj")
    for part in ("encoder", "decoder"):
        if f"{part}.layers.0.op.layer_norm1.weight" in sd or \
           f"{part}.layers.0.layer_norm1.weight" in sd:
            p[part] = convert_fft_blocks(strip_prefix(sd, f"{part}."), cfg)
    return p


def convert_fft_blocks(sd: Dict, cfg) -> Dict:
    """FFTBlocks/TransformerEncoderLayer stack -> our tts_modules params."""
    layers = []
    i = 0
    while True:
        base = f"layers.{i}.op." if f"layers.{i}.op.layer_norm1.weight" in sd else f"layers.{i}."
        if f"{base}layer_norm1.weight" not in sd:
            break
        in_w = sd[f"{base}self_attn.in_proj_weight"]
        dim = in_w.shape[1]
        qw, kw, vw = in_w[:dim], in_w[dim:2*dim], in_w[2*dim:]
        layers.append({
            "ln1": layer_norm(sd, f"{base}layer_norm1"),
            "attn": {
                "q": {"w": qw.T.astype(np.float32)},
                "k": {"w": kw.T.astype(np.float32)},
                "v": {"w": vw.T.astype(np.float32)},
                "out": {"w": sd[f"{base}self_attn.out_proj.weight"].T.astype(np.float32)},
            },
            "ln2": layer_norm(sd, f"{base}layer_norm2"),
            "ffn": {
                "conv": conv1d(sd, f"{base}ffn.ffn_1"),
                "out": linear(sd, f"{base}ffn.ffn_2"),
            },
        })
        i += 1
    p = {"layers": layers}
    if "layer_norm.weight" in sd:
        p["ln"] = layer_norm(sd, "layer_norm")
    return p


def convert_gaussian_diffusion(ckpt_path: str, hp) -> Dict:
    """Reference trainer ckpt -> {'fs2':..., 'denoise_fn':...} params."""
    from ..models.fs2 import FS2Config

    sd = load_ckpt_state_dict(ckpt_path)
    fs2_sd = strip_prefix(sd, "fs2.")
    dn_sd = strip_prefix(sd, "denoise_fn.")
    cfg = FS2Config.from_hparams(hp)
    return {
        "fs2": convert_fs2(fs2_sd, cfg),
        "denoise_fn": convert_diffnet(dn_sd, int(hp["residual_layers"])),
    }


# ---------------------------------------------------------------------------
# HiFi-GAN / NSF-HiFiGAN generators
# ---------------------------------------------------------------------------

def convert_hifigan_generator(sd: Dict, cfg) -> Dict:
    """Folded (no weight-norm) generator state dict -> generator params."""
    sd = fold_weight_norm(sd)
    p = {"conv_pre": conv1d(sd, "conv_pre"), "conv_post": conv1d(sd, "conv_post")}
    n_up = len(cfg.upsample_rates)
    p["ups"] = [conv_transpose1d(sd, f"ups.{i}") for i in range(n_up)]
    n_k = len(cfg.resblock_kernel_sizes)
    resblocks = []
    for i in range(n_up):
        blocks_i = []
        for j in range(n_k):
            pfx = f"resblocks.{i * n_k + j}"
            if cfg.resblock == "1":
                n_d = len(cfg.resblock_dilation_sizes[j])
                blocks_i.append({
                    "convs1": [conv1d(sd, f"{pfx}.convs1.{d}") for d in range(n_d)],
                    "convs2": [conv1d(sd, f"{pfx}.convs2.{d}") for d in range(n_d)],
                })
            else:
                n_d = len(cfg.resblock_dilation_sizes[j])
                blocks_i.append({
                    "convs": [conv1d(sd, f"{pfx}.convs.{d}") for d in range(n_d)],
                })
        resblocks.append(blocks_i)
    p["resblocks"] = resblocks
    if cfg.use_nsf and "m_source.l_linear.weight" in sd:
        p["m_source"] = {"l_linear": linear(sd, "m_source.l_linear")}
        p["noise_convs"] = [conv1d(sd, f"noise_convs.{i}") for i in range(n_up)]
    return p


# ---------------------------------------------------------------------------
# PitchExtractor (reference modules/fastspeech/pe.py)
# ---------------------------------------------------------------------------

def convert_pe(ckpt_path: str, hp) -> Dict:
    from ..models.pe import convert as _convert

    sd = load_ckpt_state_dict(ckpt_path)
    return _convert(sd)
