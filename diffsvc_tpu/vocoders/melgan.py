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
    # reference melgan.py:36 use_causal_conv: CausalConv1d /
    # CausalConvTranspose1d everywhere (layers/causal_conv.py:12-56)
    use_causal_conv: bool = False


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


def _causal_pad(x, pad: int):
    """CausalConv1d padding (reference layers/causal_conv.py:12-33): pad
    both sides by (k-1)*d then truncate the conv output to the input
    length — equivalent to a left-only pad before a valid conv. MelGAN
    passes its own pad module through (ReflectionPad1d by default)."""
    return jnp.pad(x, ((0, 0), (pad, 0), (0, 0)), mode="reflect")


def apply(params, cfg: MelGANConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, T, M] -> wav [B, T * prod(scales)].

    Reference melgan.py / residual_stack.py: ReflectionPad1d (not zeros)
    before every non-strided conv; each residual stack returns
    stack(c) + skip_1x1(c). With cfg.use_causal_conv, every conv sees only
    past samples: left-pad + valid conv, and the transposed convs drop
    their trailing ``stride`` samples (causal_conv.py:36-56)."""
    causal = cfg.use_causal_conv
    pad_in = (lambda x, p: _causal_pad(x, 2 * p)) if causal else _reflect_pad
    x = nn.conv1d(params["conv_in"], pad_in(mel, 3), padding=0)
    for rate, up, stacks in zip(cfg.upsample_scales, params["ups"],
                                params["blocks"]):
        x = jax.nn.leaky_relu(x, 0.2)
        if causal:
            # CausalConvTranspose1d: no padding, then [:, :-stride]
            x = nn.conv_transpose1d(up, x, stride=rate, padding=0)[:, :-rate]
        else:
            x = nn.conv_transpose1d(up, x, stride=rate, padding=rate // 2)
        for j, blk in enumerate(stacks):
            d = cfg.stack_kernel_size**j
            y = jax.nn.leaky_relu(x, 0.2)
            pad = (cfg.stack_kernel_size - 1) * d
            y = _causal_pad(y, pad) if causal else _reflect_pad(y, pad // 2)
            y = nn.conv1d(blk["c1"], y, dilation=d, padding=0)
            y = jax.nn.leaky_relu(y, 0.2)
            y = nn.conv1d(blk["c2"], y)
            x = nn.conv1d(blk["skip"], x) + y
    x = jax.nn.leaky_relu(x, 0.2)
    x = nn.conv1d(params["conv_out"], pad_in(x, 3), padding=0)
    return jnp.tanh(x)[:, :, 0]


# ---------------------------------------------------------------------------
# MelGAN discriminator (reference modules/parallel_wavegan/models/melgan.py:
# MelGANDiscriminator :194-315, MelGANMultiScaleDiscriminator :317-413).
# Completeness item: unused by any SVC path in the reference, but part of the
# vendored package's public surface.

class MelGANDiscriminatorConfig(NamedTuple):
    in_channels: int = 1
    out_channels: int = 1
    kernel_sizes: Tuple[int, int] = (5, 3)
    channels: int = 16
    max_downsample_channels: int = 1024
    downsample_scales: Tuple[int, ...] = (4, 4, 4, 4)
    scales: int = 3          # multi-scale only
    pool_kernel: int = 4     # AvgPool1d(kernel 4, stride 2, pad 1,
    pool_stride: int = 2     #           count_include_pad=False)
    pool_pad: int = 1


def _disc_channel_plan(cfg: MelGANDiscriminatorConfig):
    """(in, out, kernel, stride, groups, pad_mode) per layer."""
    plan = [(cfg.in_channels, cfg.channels,
             cfg.kernel_sizes[0] * cfg.kernel_sizes[1], 1, 1, "reflect")]
    in_chs = cfg.channels
    for s in cfg.downsample_scales:
        out_chs = min(in_chs * s, cfg.max_downsample_channels)
        plan.append((in_chs, out_chs, s * 10 + 1, s, in_chs // 4, "zeros"))
        in_chs = out_chs
    out_chs = min(in_chs * 2, cfg.max_downsample_channels)
    plan.append((in_chs, out_chs, cfg.kernel_sizes[0], 1, 1, "zeros"))
    plan.append((out_chs, cfg.out_channels, cfg.kernel_sizes[1], 1, 1, "zeros"))
    return plan


def init_discriminator(key, cfg: MelGANDiscriminatorConfig):
    keys = iter(jax.random.split(key, 64))
    return [nn.init_conv1d(next(keys), k, c_in // g, c_out)
            for (c_in, c_out, k, _s, g, _p) in _disc_channel_plan(cfg)]


def apply_discriminator(params, cfg: MelGANDiscriminatorConfig, wav):
    """wav [B, T] (or [B, T, C]) -> list of per-layer outputs [B, T', C'],
    last entry the score map (reference forward returns every layer's
    output for feature-matching losses)."""
    x = wav[:, :, None] if wav.ndim == 2 else wav
    plan = _disc_channel_plan(cfg)
    outs = []
    n = len(plan)
    for i, (p, (c_in, c_out, k, s, g, pad_mode)) in enumerate(zip(params, plan)):
        if pad_mode == "reflect":
            x = nn.conv1d(p, _reflect_pad(x, (k - 1) // 2), padding=0)
        else:
            # torch Conv1d zero padding: s*5 == (k-1)//2 for k = s*10+1
            x = nn.conv1d(p, x, stride=s, padding=(k - 1) // 2, groups=g)
        if i < n - 1:
            x = jax.nn.leaky_relu(x, 0.2)
        outs.append(x)
    return outs


def _avg_pool_no_pad_count(x, k: int, stride: int, pad: int):
    """AvgPool1d with count_include_pad=False on [B, T, C]."""
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, 1), (1, stride, 1),
        [(0, 0), (pad, pad), (0, 0)])
    ones = jnp.ones((1, x.shape[1], 1), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, k, 1), (1, stride, 1),
        [(0, 0), (pad, pad), (0, 0)])
    return sums / counts


def init_multiscale_discriminator(key, cfg: MelGANDiscriminatorConfig):
    return [init_discriminator(k, cfg)
            for k in jax.random.split(key, cfg.scales)]


def apply_multiscale_discriminator(params, cfg: MelGANDiscriminatorConfig, wav):
    """wav [B, T] -> list (per scale) of lists of layer outputs; the input
    is AvgPool1d-downsampled (count_include_pad=False) between scales."""
    x = wav[:, :, None] if wav.ndim == 2 else wav
    outs = []
    for p in params:
        outs.append(apply_discriminator(p, cfg, x))
        x = _avg_pool_no_pad_count(x, cfg.pool_kernel, cfg.pool_stride,
                                   cfg.pool_pad)
    return outs


def convert_discriminator(sd, cfg: MelGANDiscriminatorConfig):
    """Torch MelGANDiscriminator state dict (weight-norm folded or plain)
    -> params. Layer i lives at layers.{i}.{j} where j indexes inside the
    Sequential (conv after optional pad module)."""
    from ..utils.convert_torch import conv1d as _c1d, fold_weight_norm

    sd = fold_weight_norm({k: v for k, v in sd.items()})
    n_layers = len(_disc_channel_plan(cfg))
    params = []
    for i in range(n_layers):
        # first layer: Sequential(pad, conv, act) -> conv at .1;
        # middle/final: Sequential(conv, act) -> conv at .0; last: bare conv
        for j in (1, 0, ""):
            key = f"layers.{i}.{j}.weight" if j != "" else f"layers.{i}.weight"
            if key in sd:
                prefix = key[: -len(".weight")]
                params.append(_c1d(sd, prefix))
                break
        else:
            raise KeyError(f"no conv found for layer {i}")
    return params


def convert_multiscale_discriminator(sd, cfg: MelGANDiscriminatorConfig):
    from ..utils.convert_torch import strip_prefix

    return [convert_discriminator(
        strip_prefix(sd, f"discriminators.{i}."), cfg)
        for i in range(cfg.scales)]
