"""ParallelWaveGAN generator (legacy 24 kHz vocoder slot), official layout.

Functional JAX port matching the vendored parallel_wavegan generator
(reference ``modules/parallel_wavegan/models/parallel_wavegan.py:21-205``):

- ``first_conv`` 1x1 on the noise input,
- ``upsample_net``: ConvInUpsampleNetwork — aux context conv (bias-free,
  kernel 2*aux_context_window+1) then per-scale [Stretch2d, bias-free
  Conv2d(1, 2*scale+1)] pairs,
- 30 residual blocks: dilated conv -> gated tanh/sigmoid halves with aux
  1x1 adds -> separate res / skip 1x1 convs, residual scaled by sqrt(0.5),
- ``last_conv_layers``: relu -> 1x1 -> relu -> 1x1.

Weight-norm is folded at conversion; official checkpoints
(``checkpoint-*.pkl`` with ``model.generator``) and reference-trainer ckpts
(``state_dict.model_gen``) both load.
"""

from __future__ import annotations

import math
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
    upsample_scales: Tuple[int, ...] = (4, 4, 4, 4)
    use_pitch_embed: bool = False

    @classmethod
    def from_dict(cls, g: dict):
        ups = g.get("upsample_params", {}).get("upsample_scales",
                                               g.get("upsample_scales", (4, 4, 4, 4)))
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
            upsample_scales=tuple(ups),
            use_pitch_embed=bool(g.get("use_pitch_embed", False)),
        )


def init(key, cfg: PWGConfig):
    keys = iter(jax.random.split(key, 16 + 4 * cfg.layers))
    rc, gc, sc = cfg.residual_channels, cfg.gate_channels, cfg.skip_channels
    aux_k = 2 * cfg.aux_context_window + 1
    p = {
        "first_conv": nn.init_conv1d(next(keys), 1, cfg.in_channels, rc),
        "upsample_conv_in": nn.init_conv1d(next(keys), aux_k, cfg.aux_channels,
                                           cfg.aux_channels, bias=False),
        "upsample_convs": [
            {"w": jnp.full((1, 2 * s + 1), 1.0 / (2 * s + 1))}
            for s in cfg.upsample_scales],
        "layers": [],
        "last_conv1": nn.init_conv1d(next(keys), 1, sc, sc),
        "last_conv2": nn.init_conv1d(next(keys), 1, sc, cfg.out_channels),
    }
    for _ in range(cfg.layers):
        p["layers"].append({
            "conv": nn.init_conv1d(next(keys), cfg.kernel_size, rc, gc),
            "aux": nn.init_conv1d(next(keys), 1, cfg.aux_channels, gc, bias=False),
            "out": nn.init_conv1d(next(keys), 1, gc // 2, rc),
            "skip": nn.init_conv1d(next(keys), 1, gc // 2, sc),
        })
    return p


def upsample_aux(params, cfg: PWGConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """ConvInUpsampleNetwork: context conv then stretch+smooth per scale.

    mel [B, T, M] -> [B, T*prod(scales), M] (caller trims the context pad)."""
    c = nn.conv1d(params["upsample_conv_in"], mel,
                  padding=0)  # valid: consumes the context window
    for s, up in zip(cfg.upsample_scales, params["upsample_convs"]):
        c = jnp.repeat(c, s, axis=1)  # Stretch2d (nearest in time)
        # bias-free smoothing conv along time, per channel (torch Conv2d
        # with kernel (1, 2s+1) acts identically on every mel channel)
        k = up["w"].shape[1]
        w = jnp.broadcast_to(up["w"][0][:, None, None], (k, 1, 1))
        b, t, m = c.shape
        cc = c.transpose(0, 2, 1).reshape(b * m, t, 1)
        cc = jax.lax.conv_general_dilated(
            cc, w, (1,), [(k // 2, k // 2)],
            dimension_numbers=("NHC", "HIO", "NHC"))
        c = cc.reshape(b, m, t).transpose(0, 2, 1)
    return c


def apply(params, cfg: PWGConfig, z, mel, pitch=None):
    """z [B, L] noise at sample rate, mel [B, T, M] (scaler-normalized),
    pitch [B, T] int coarse-f0 bins when cfg.use_pitch_embed.
    Returns wav [B, L]. L must equal (T - 2*aux_context_window)*prod(scales).
    """
    if cfg.use_pitch_embed and pitch is not None:
        # reference parallel_wavegan.py:151-153: c = c_proj([c ; embed(p)])
        pe = nn.embedding(params["pitch_embed"], pitch)
        mel = nn.linear(params["c_proj"], jnp.concatenate([mel, pe], axis=-1))
    aux = upsample_aux(params, cfg, mel)
    aux = aux[:, : z.shape[1]]

    x = nn.conv1d(params["first_conv"], z[:, :, None])
    skips = 0.0
    layers_per_stack = cfg.layers // cfg.stacks
    half = cfg.gate_channels // 2
    for i, lp in enumerate(params["layers"]):
        dilation = 2 ** (i % layers_per_stack)
        y = nn.conv1d(lp["conv"], x, dilation=dilation)
        y = y + nn.conv1d(lp["aux"], aux)
        xa, xb = y[..., :half], y[..., half:]
        y = jnp.tanh(xa) * jax.nn.sigmoid(xb)
        res = nn.conv1d(lp["out"], y)
        skip = nn.conv1d(lp["skip"], y)
        x = (x + res) * math.sqrt(0.5)
        skips = skips + skip
    s = skips * math.sqrt(1.0 / cfg.layers)
    s = jax.nn.relu(s)
    s = nn.conv1d(params["last_conv1"], s)
    s = jax.nn.relu(s)
    s = nn.conv1d(params["last_conv2"], s)
    return s[:, :, 0]


def convert(sd: dict, cfg: PWGConfig) -> dict:
    """Official/reference PWG generator state dict -> params (folds wn)."""
    from ..utils import convert_torch as cvt

    sd = cvt.fold_weight_norm(sd)
    p = {
        "first_conv": cvt.conv1d(sd, "first_conv"),
        "upsample_conv_in": cvt.conv1d(
            sd, "upsample_net.conv_in", bias=False),
        "upsample_convs": [],
        "layers": [],
        "last_conv1": cvt.conv1d(sd, "last_conv_layers.1"),
        "last_conv2": cvt.conv1d(sd, "last_conv_layers.3"),
    }
    # up_layers indices: [Stretch2d, Conv2d, Stretch2d, Conv2d, ...]
    i = 1
    while f"upsample_net.upsample.up_layers.{i}.weight" in sd:
        w = sd[f"upsample_net.upsample.up_layers.{i}.weight"]  # [1,1,1,k]
        p["upsample_convs"].append({"w": jnp.asarray(w[0, 0])})  # [1, k]
        i += 2
    for j in range(cfg.layers):
        pfx = f"conv_layers.{j}"
        p["layers"].append({
            "conv": cvt.conv1d(sd, f"{pfx}.conv"),
            "aux": cvt.conv1d(sd, f"{pfx}.conv1x1_aux", bias=False),
            "out": cvt.conv1d(sd, f"{pfx}.conv1x1_out"),
            "skip": cvt.conv1d(sd, f"{pfx}.conv1x1_skip"),
        })
    if cfg.use_pitch_embed:
        p["pitch_embed"] = jnp.asarray(sd["pitch_embed.weight"])
        p["c_proj"] = cvt.linear(sd, "c_proj")
    return p


# ---------------------------------------------------------------------------
# PWG discriminators (reference modules/parallel_wavegan/models/
# parallel_wavegan.py: ParallelWaveGANDiscriminator :207-303,
# ResidualParallelWaveGANDiscriminator :305-435). Never trained by the
# reference's SVC path; implemented for inventory completeness and so
# training/vocoder_task.py can adversarially train the PWG generator.


class PWGDiscriminatorConfig(NamedTuple):
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 10
    conv_channels: int = 64
    dilation_factor: int = 1


def _disc_layer_plan(cfg: PWGDiscriminatorConfig):
    """(c_in, c_out, dilation) per conv, matching the reference's loop
    (parallel_wavegan.py:243-262): layer 0 has dilation 1 from in_channels;
    layer i>0 has dilation i (or dilation_factor**i) from conv_channels;
    the final conv is dilation 1, conv_channels -> out_channels."""
    plan = []
    for i in range(cfg.layers - 1):
        if i == 0:
            dilation, c_in = 1, cfg.in_channels
        else:
            dilation = i if cfg.dilation_factor == 1 else cfg.dilation_factor ** i
            c_in = cfg.conv_channels
        plan.append((c_in, cfg.conv_channels, dilation))
    plan.append((cfg.conv_channels, cfg.out_channels, 1))
    return plan


def init_discriminator(key, cfg: PWGDiscriminatorConfig):
    keys = iter(jax.random.split(key, cfg.layers))
    return [nn.init_conv1d(next(keys), cfg.kernel_size, c_in, c_out)
            for (c_in, c_out, _d) in _disc_layer_plan(cfg)]


def apply_discriminator(params, cfg: PWGDiscriminatorConfig, wav):
    """wav [B, T] (or [B, T, C]) -> score map [B, T, out_channels].

    Each conv keeps length via torch padding (k-1)//2*dilation; LeakyReLU(0.2)
    after every conv but the last (reference forward :268-280)."""
    x = wav[:, :, None] if wav.ndim == 2 else wav
    plan = _disc_layer_plan(cfg)
    for i, (p, (_ci, _co, d)) in enumerate(zip(params, plan)):
        x = nn.conv1d(p, x, dilation=d,
                      padding=(cfg.kernel_size - 1) // 2 * d)
        if i < len(plan) - 1:
            x = jax.nn.leaky_relu(x, 0.2)
    return x


def convert_discriminator(sd: dict, cfg: PWGDiscriminatorConfig):
    """Torch ParallelWaveGANDiscriminator state dict -> params (folds wn).

    conv_layers is a flat ModuleList alternating [conv, activation], so the
    convs live at even indices 0, 2, ..., 2*(layers-1)."""
    from ..utils import convert_torch as cvt

    sd = cvt.fold_weight_norm(sd)
    return [cvt.conv1d(sd, f"conv_layers.{2 * i}") for i in range(cfg.layers)]


class ResidualPWGDiscriminatorConfig(NamedTuple):
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64


def init_residual_discriminator(key, cfg: ResidualPWGDiscriminatorConfig):
    keys = iter(jax.random.split(key, 8 + 4 * cfg.layers))
    rc, gc, sc = cfg.residual_channels, cfg.gate_channels, cfg.skip_channels
    p = {
        "first_conv": nn.init_conv1d(next(keys), 1, cfg.in_channels, rc),
        "layers": [],
        "last_conv1": nn.init_conv1d(next(keys), 1, sc, sc),
        "last_conv2": nn.init_conv1d(next(keys), 1, sc, cfg.out_channels),
    }
    for _ in range(cfg.layers):
        p["layers"].append({
            "conv": nn.init_conv1d(next(keys), cfg.kernel_size, rc, gc),
            "out": nn.init_conv1d(next(keys), 1, gc // 2, rc),
            "skip": nn.init_conv1d(next(keys), 1, gc // 2, sc),
        })
    return p


def apply_residual_discriminator(params, cfg: ResidualPWGDiscriminatorConfig,
                                 wav):
    """WaveNet-style discriminator: the generator's residual stack with no
    aux conditioning (aux_channels=-1) and LeakyReLU around the 1x1 in/out
    convs (reference forward :393-414). wav [B, T] -> [B, T, out_channels]."""
    x = wav[:, :, None] if wav.ndim == 2 else wav
    x = jax.nn.leaky_relu(nn.conv1d(params["first_conv"], x), 0.2)
    skips = 0.0
    layers_per_stack = cfg.layers // cfg.stacks
    half = cfg.gate_channels // 2
    for i, lp in enumerate(params["layers"]):
        dilation = 2 ** (i % layers_per_stack)
        y = nn.conv1d(lp["conv"], x, dilation=dilation)
        xa, xb = y[..., :half], y[..., half:]
        y = jnp.tanh(xa) * jax.nn.sigmoid(xb)
        skips = skips + nn.conv1d(lp["skip"], y)
        x = (x + nn.conv1d(lp["out"], y)) * math.sqrt(0.5)
    s = skips * math.sqrt(1.0 / cfg.layers)
    s = jax.nn.leaky_relu(s, 0.2)
    s = nn.conv1d(params["last_conv1"], s)
    s = jax.nn.leaky_relu(s, 0.2)
    return nn.conv1d(params["last_conv2"], s)


def convert_residual_discriminator(sd: dict,
                                   cfg: ResidualPWGDiscriminatorConfig):
    """Torch ResidualParallelWaveGANDiscriminator state dict -> params.
    first_conv is Sequential(Conv1d1x1, act) -> conv at .0; residual blocks
    at conv_layers.{i}.{conv,conv1x1_out,conv1x1_skip} (no conv1x1_aux:
    aux_channels=-1); last 1x1s at last_conv_layers.{1,3}."""
    from ..utils import convert_torch as cvt

    sd = cvt.fold_weight_norm(sd)
    p = {
        "first_conv": cvt.conv1d(sd, "first_conv.0"),
        "layers": [],
        "last_conv1": cvt.conv1d(sd, "last_conv_layers.1"),
        "last_conv2": cvt.conv1d(sd, "last_conv_layers.3"),
    }
    for j in range(cfg.layers):
        pfx = f"conv_layers.{j}"
        p["layers"].append({
            "conv": cvt.conv1d(sd, f"{pfx}.conv"),
            "out": cvt.conv1d(sd, f"{pfx}.conv1x1_out"),
            "skip": cvt.conv1d(sd, f"{pfx}.conv1x1_skip"),
        })
    return p


class PWGGenerator:
    """Checkpoint-loading wrapper (mirrors network/vocoders/pwg.py:54-103)."""

    def __init__(self, hp):
        import glob as _glob
        import re as _re

        import yaml as _yaml

        from ..utils import convert_torch as cvt

        self.hp = hp
        base_dir = hp.get("vocoder_ckpt") or "wavegan_pretrained"
        with open(f"{base_dir}/config.yaml", encoding="utf-8") as f:
            config = _yaml.safe_load(f)
        self.cfg = PWGConfig.from_dict(config.get("generator_params", config))
        self.hop = config.get("hop_size", hp.get("hop_size", 128))

        ckpts = _glob.glob(f"{base_dir}/model_ckpt_steps_*.ckpt") or \
            _glob.glob(f"{base_dir}/checkpoint-*steps.pkl")
        assert ckpts, f"no PWG checkpoint under {base_dir}"
        ckpt_path = max(ckpts, key=lambda x: int(_re.findall(r"(\d+)", x)[-1]))
        ckpt = cvt.torch_load(ckpt_path)
        if "state_dict" in ckpt:  # reference-trainer format
            sd = cvt.strip_prefix(
                {k: cvt._to_np(v) for k, v in ckpt["state_dict"].items()},
                "model_gen.")
            self.scaler_mean = self.scaler_scale = None
        else:  # official format
            sd = {k: cvt._to_np(v) for k, v in ckpt["model"]["generator"].items()}
            import os as _os

            stats_h5 = f"{base_dir}/stats.h5"
            stats_npy = f"{base_dir}/stats.npy"
            if _os.path.exists(stats_h5):
                # official PWG dirs ship StandardScaler stats as hdf5
                # (reference network/vocoders/pwg.py:32-39)
                import h5py

                with h5py.File(stats_h5, "r") as f:
                    self.scaler_mean = np.asarray(f["mean"])
                    self.scaler_scale = np.asarray(f["scale"])
            elif _os.path.exists(stats_npy):
                arr = np.load(stats_npy)
                self.scaler_mean, self.scaler_scale = arr[0], arr[1]
            else:
                print(f"| WARNING: no stats.h5/stats.npy under {base_dir} — "
                      "official PWG generators expect StandardScaler-"
                      "normalized mel; output will be wrong without it")
                self.scaler_mean = self.scaler_scale = None
        self.params = convert(sd, self.cfg)
        self._apply = jax.jit(
            lambda p, z, m, pit=None: apply(p, self.cfg, z, m, pitch=pit),
            static_argnames=())
        print(f"| Loaded PWG from {ckpt_path}")

    def spec2wav(self, mel, **kwargs):
        c = np.asarray(mel, np.float32)
        if self.scaler_mean is not None:
            c = (c - self.scaler_mean) / self.scaler_scale
        pad = self.cfg.aux_context_window
        c = np.pad(c, ((pad, pad), (0, 0)), "edge")
        z = np.random.RandomState(kwargs.get("seed", 0)).randn(
            1, mel.shape[0] * self.hop).astype(np.float32)
        pit = None
        if self.cfg.use_pitch_embed:
            # reference wrapper: pitch = f0_to_coarse(f0), edge-padded like
            # the mel (network/vocoders/pwg.py:96-100)
            from ..ops.pitch import f0_to_coarse

            f0 = kwargs.get("f0")
            assert f0 is not None, "PWG with use_pitch_embed needs f0"
            pit = np.asarray(f0_to_coarse(
                np.asarray(f0, np.float32), self.hp.get("f0_bin", 256),
                self.hp.get("f0_min", 80.0), self.hp.get("f0_max", 750.0)))
            pit = np.pad(pit, (pad, pad), "edge")[None].astype(np.int32)
            y = self._apply(self.params, jnp.asarray(z), jnp.asarray(c[None]),
                            jnp.asarray(pit))
        else:
            y = self._apply(self.params, jnp.asarray(z), jnp.asarray(c[None]))
        return np.asarray(y[0])
