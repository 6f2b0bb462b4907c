"""MelGAN generator (legacy vocoder slot from the vendored parallel_wavegan).

Functional JAX port of the standard MelGAN architecture: 7x1 input conv ->
per-scale [leaky_relu, ConvTranspose(2*rate, rate), 3 dilated residual
stacks] -> 7x1 output conv + tanh. Kept for registry completeness; HiFi-GAN
/ NSF-HiFiGAN are the production vocoders.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models import nn


class MelGANConfig(NamedTuple):
    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    upsample_scales: Tuple[int, ...] = (8, 8, 2, 2)
    stack_kernel_size: int = 3
    stacks: int = 3


def init(key, cfg: MelGANConfig):
    keys = iter(jax.random.split(key, 128))
    p = {"conv_in": nn.init_conv1d(next(keys), 7, cfg.in_channels, cfg.channels)}
    ch = cfg.channels
    ups, blocks = [], []
    for rate in cfg.upsample_scales:
        ups.append(nn.init_conv_transpose1d(next(keys), rate * 2, ch, ch // 2, rate))
        ch //= 2
        stacks_i = []
        for j in range(cfg.stacks):
            stacks_i.append({
                "c1": nn.init_conv1d(next(keys), cfg.stack_kernel_size, ch, ch),
                "c2": nn.init_conv1d(next(keys), 1, ch, ch),
                # learned 1x1 skip conv (residual_stack.py:62-63), NOT an
                # identity residual
                "skip": nn.init_conv1d(next(keys), 1, ch, ch),
            })
        blocks.append(stacks_i)
    p["ups"] = ups
    p["blocks"] = blocks
    p["conv_out"] = nn.init_conv1d(next(keys), 7, ch, cfg.out_channels)
    return p


def _reflect_pad(x, pad: int):
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


def apply(params, cfg: MelGANConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, T, M] -> wav [B, T * prod(scales)].

    Reference melgan.py / residual_stack.py: ReflectionPad1d (not zeros)
    before every non-strided conv; each residual stack returns
    stack(c) + skip_1x1(c)."""
    x = nn.conv1d(params["conv_in"], _reflect_pad(mel, 3), padding=0)
    for rate, up, stacks in zip(cfg.upsample_scales, params["ups"],
                                params["blocks"]):
        x = jax.nn.leaky_relu(x, 0.2)
        x = nn.conv_transpose1d(up, x, stride=rate, padding=rate // 2)
        for j, blk in enumerate(stacks):
            d = cfg.stack_kernel_size**j
            y = jax.nn.leaky_relu(x, 0.2)
            pad = (cfg.stack_kernel_size - 1) // 2 * d
            y = nn.conv1d(blk["c1"], _reflect_pad(y, pad), dilation=d, padding=0)
            y = jax.nn.leaky_relu(y, 0.2)
            y = nn.conv1d(blk["c2"], y)
            x = nn.conv1d(blk["skip"], x) + y
    x = jax.nn.leaky_relu(x, 0.2)
    x = nn.conv1d(params["conv_out"], _reflect_pad(x, 3), padding=0)
    return jnp.tanh(x)[:, :, 0]
