"""iSTFT-head vocoder — a TPU-first alternative vocoder family.

Motivation (BASELINE.md round-3 analysis): HiFi-GAN-style upsampling
vocoders are MXU *pass-bound* on TPU — their small-channel tail stages
issue hundreds of 128-lane systolic passes and plateau around ~20 ms for
10 s of 44.1 kHz audio no matter the dtype or kernel schedule.  This
family removes the upsampling stack entirely: a wide ConvNeXt-style
backbone runs at the MEL frame rate (dim >= 512, every matmul engages
multiple MXUs), and one inverse-rDFT matmul + overlap-add (ops/istft.py)
renders the waveform.  FLOP count is comparable, but they are spent in
[T, 512+]-shaped contractions instead of [T*512, 16..64] ones.

Design follows the published iSTFT-head vocoder literature (Vocos /
WaveNeXt-style: backbone at frame rate, exp-magnitude + phase head,
normalized windowed OLA), re-derived for TPU: dense k=3 convs instead of
depthwise (depthwise is lane-starved on the MXU), channels-last, pitch
conditioning via a coarse-f0 embedding so SVC's key-shift semantics carry
over.  No reference counterpart — the reference ships conv upsamplers
only; this is an additive family, trainable in-repo with the existing
GAN/STFT losses (training/vocoder_task.py).

Input convention: **log10-mel** [B, T, M] (same domain the diffusion
model emits), f0 in Hz [B, T].
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import nn
from ..ops.istft import istft
from ..ops.pitch import f0_to_coarse
from .base import BaseVocoder, register_vocoder


class IstftVocoderConfig(NamedTuple):
    num_mels: int = 128
    dim: int = 512
    n_layers: int = 8
    mlp_ratio: int = 3
    n_fft: int = 2048
    hop: int = 512
    sampling_rate: int = 44100
    use_f0: bool = True
    f0_bin: int = 256
    f0_min: float = 40.0
    f0_max: float = 1100.0

    @classmethod
    def from_hparams(cls, hp):
        return cls(
            num_mels=int(hp["audio_num_mel_bins"]),
            dim=int(hp.get("istft_dim", 512)),
            n_layers=int(hp.get("istft_layers", 8)),
            n_fft=int(hp["fft_size"]),
            hop=int(hp["hop_size"]),
            sampling_rate=int(hp["audio_sample_rate"]),
            use_f0=bool(hp.get("use_nsf", True)),
            f0_bin=int(hp.get("f0_bin", 256)),
            f0_min=float(hp.get("f0_min", 40.0)),
            f0_max=float(hp.get("f0_max", 1100.0)),
        )


def init(key, cfg: IstftVocoderConfig):
    keys = iter(jax.random.split(key, 8 + 4 * cfg.n_layers))
    d, m = cfg.dim, cfg.mlp_ratio
    n_bins = cfg.n_fft // 2 + 1
    params = {
        "stem": nn.init_conv1d(next(keys), 7, cfg.num_mels, d),
        "stem_ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "blocks": [],
        "final_ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "head": nn.init_linear(next(keys), d, 2 * n_bins),
    }
    if cfg.use_f0:
        params["f0_embed"] = nn.normal_embedding(next(keys), cfg.f0_bin, d,
                                                 padding_idx=0)
    for _ in range(cfg.n_layers):
        params["blocks"].append({
            "conv": nn.init_conv1d(next(keys), 3, d, d),
            "ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "mlp1": nn.init_linear(next(keys), d, m * d),
            "mlp2": nn.init_linear(next(keys), m * d, d),
            # layer-scale: start each residual branch near-identity
            "gamma": jnp.full((d,), 1e-2),
        })
    return params


def _ln(p, x, eps: float = 1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def apply(params, cfg: IstftVocoderConfig, mel: jnp.ndarray, f0=None,
          rng=None, dtype=None):
    """log10-mel [B, T, M] (+ f0 Hz [B, T]) -> wav [B, T*hop].

    ``dtype=jnp.bfloat16`` runs the backbone in bf16; the head and the
    iSTFT stay fp32 (phase accuracy).
    """
    n_bins = cfg.n_fft // 2 + 1
    x = nn.conv1d(params["stem"], mel, padding=3)
    if cfg.use_f0 and f0 is not None:
        coarse = f0_to_coarse(f0, cfg.f0_bin, cfg.f0_min, cfg.f0_max)
        x = x + params["f0_embed"][coarse]
    x = _ln(params["stem_ln"], x)
    if dtype is not None:
        x = x.astype(dtype)
    for blk in params["blocks"]:
        h = nn.conv1d({k: v.astype(x.dtype) for k, v in blk["conv"].items()},
                      x, padding=1)
        h = _ln({k: v.astype(jnp.float32) for k, v in blk["ln"].items()},
                h.astype(jnp.float32)).astype(x.dtype)
        h = nn.linear({k: v.astype(x.dtype) for k, v in blk["mlp1"].items()}, h)
        h = jax.nn.gelu(h)
        h = nn.linear({k: v.astype(x.dtype) for k, v in blk["mlp2"].items()}, h)
        x = x + blk["gamma"].astype(x.dtype) * h
    x = _ln(params["final_ln"], x.astype(jnp.float32))
    out = nn.linear(params["head"], x)                       # [B, T, 2*bins]
    logmag = jnp.clip(out[..., :n_bins], -12.0, 6.0)
    phase = out[..., n_bins:]
    mag = jnp.exp(logmag)
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    t = mel.shape[1]
    length = t * cfg.hop
    wav = jax.vmap(lambda r, i: istft(r, i, n_fft=cfg.n_fft, hop=cfg.hop,
                                      length=length))(re, im)
    return jnp.clip(wav, -1.0, 1.0).astype(jnp.float32)


def save_params(path: str, params) -> None:
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    np.savez(path, **{jax.tree_util.keystr(k): np.asarray(v)
                      for k, v in flat})


def load_params(path: str, cfg: IstftVocoderConfig):
    """Restore by structure: re-init a skeleton and fill leaves by path."""
    data = np.load(path)
    skeleton = init(jax.random.PRNGKey(0), cfg)
    flat, treedef = jax.tree_util.tree_flatten_with_path(skeleton)
    leaves = [jnp.asarray(data[jax.tree_util.keystr(k)]) for k, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


@register_vocoder
class IstftVocoder(BaseVocoder):
    """Registry wrapper (``vocoder: IstftVocoder`` / ``istftvocoder``).

    Checkpoints are .npz pytrees from :func:`save_params` (this family is
    trained in-repo by training/vocoder_task.py — there are no community
    checkpoints to stay compatible with)."""

    def __init__(self, hp):
        import os

        self.hp = hp
        self.cfg = IstftVocoderConfig.from_hparams(hp)
        ckpt = str(hp.get("vocoder_ckpt", ""))
        if ckpt and os.path.isfile(ckpt):
            self.params = load_params(ckpt, self.cfg)
            print(f"| Loaded IstftVocoder from {ckpt}")
        else:
            print(f"| IstftVocoder: no checkpoint at '{ckpt}' — random init")
            self.params = init(jax.random.PRNGKey(0), self.cfg)
        self._apply = jax.jit(lambda p, m, f0v: apply(p, self.cfg, m, f0v))
        self._apply_nof0 = jax.jit(lambda p, m: apply(p, self.cfg, m))

    def spec2wav(self, mel, **kwargs):
        import numpy as np_

        c = jnp.asarray(mel, jnp.float32)[None]
        f0 = kwargs.get("f0")
        if f0 is not None and self.cfg.use_f0:
            y = self._apply(self.params, c,
                            jnp.asarray(f0, jnp.float32)[None])
        else:
            y = self._apply_nof0(self.params, c)
        return np_.asarray(y[0])

    @staticmethod
    def wav2spec(wav_fn, hp=None):
        # same canonical mel as the NSF family at 44.1k profiles
        from .nsf_hifigan import NsfHifiGAN

        return NsfHifiGAN.wav2spec(wav_fn, hp=hp)
