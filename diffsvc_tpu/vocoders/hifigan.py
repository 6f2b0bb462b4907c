"""24 kHz HiFi-GAN vocoder wrapper (reference network/vocoders/hifigan.py).

Loads reference checkpoints (``model_ckpt_steps_*.ckpt`` with
``state_dict.model_gen``, or HF-style ``generator``), folds weight norm at
conversion, and exposes ``spec2wav(mel, f0=...)`` with optional NSF source
(``use_nsf``) plus the canonical 24 kHz ``wav2spec``.
"""

from __future__ import annotations

import glob
import json
import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from ..config.hparams import load_config_chain
from ..ops import mel as mel_ops
from ..utils import convert_torch as cvt
from . import generator
from .base import BaseVocoder, register_vocoder


def bucket_mel_f0(hp, mel, f0):
    """Opt-in vocoder length bucketing (``voc_bucket_frames``): pad the mel
    time axis up to a bucket multiple (with the utterance's silence-floor
    value; f0 padded with 0) so each length bucket compiles ONCE instead of
    one 20-70 s TPU compile per distinct clip length. Callers trim the wav
    back to t_real*hop. Off (0) by default — padding bleeds into the last
    ~receptive-field samples, so reference-exact output keeps exact shapes.

    Returns (mel, f0, t_real)."""
    bucket = int(hp.get("voc_bucket_frames", 0) or 0)
    mel = np.asarray(mel, np.float32)
    t_real = mel.shape[0]
    if bucket <= 1 or t_real % bucket == 0:
        return mel, f0, t_real
    pad = bucket - t_real % bucket
    mel = np.pad(mel, ((0, pad), (0, 0)), constant_values=float(mel.min()))
    if f0 is not None:
        f0 = np.pad(np.asarray(f0, np.float32), (0, pad))
    return mel, f0, t_real


def load_model(config_path: str, file_path: str, use_nsf: bool):
    if config_path.endswith(".yaml"):
        config = load_config_chain(config_path)
    else:
        config = json.load(open(config_path, encoding="utf-8"))
    ext = os.path.splitext(file_path)[-1]
    ckpt = cvt.torch_load(file_path)
    if ext == ".ckpt":
        if "state_dict" in ckpt and "model_gen" in ckpt["state_dict"]:
            state = ckpt["state_dict"]["model_gen"]
        else:
            state = ckpt["generator"]
    else:
        state = ckpt.get("generator", ckpt)
    state = {k: cvt._to_np(v) for k, v in state.items()}
    cfg = generator.HifiGanConfig.from_dict(config, use_nsf=use_nsf)
    params = cvt.convert_hifigan_generator(state, cfg)
    print(f"| Loaded HifiGAN generator from {file_path}")
    return params, cfg, config


@register_vocoder
class HifiGAN(BaseVocoder):
    def __init__(self, hp):
        self.hp = hp
        base_dir = hp["vocoder_ckpt"]
        use_nsf = bool(hp.get("use_nsf"))
        config_path = f"{base_dir}/config.yaml"
        if os.path.exists(config_path):
            file_path = sorted(
                glob.glob(f"{base_dir}/model_ckpt_steps_*.*"),
                key=lambda x: int(re.findall(r"model_ckpt_steps_(\d+)", x)[0]))[-1]
            self.params, self.cfg, self.config = load_model(config_path, file_path, use_nsf)
        else:
            config_path = f"{base_dir}/config.json"
            file_path = f"{base_dir}/generator_v1"
            if os.path.exists(config_path):
                self.params, self.cfg, self.config = load_model(config_path, file_path, use_nsf)
            else:
                raise FileNotFoundError(f"no vocoder config under {base_dir}")
        generator.setup_serving(self, hp)

    def spec2wav(self, mel, **kwargs):
        """mel [T, M] log10-mel -> wav [T*hop]."""
        mel, f0_in, t_real = bucket_mel_f0(self.hp, mel, kwargs.get("f0"))
        c = jnp.asarray(np.asarray(mel, np.float32))[None]
        f0 = f0_in
        if f0 is not None and self.hp.get("use_nsf"):
            f0 = jnp.asarray(np.asarray(f0, np.float32))[None]
            rng = jax.random.PRNGKey(kwargs.get("seed", 0))
            y = self._apply(self.run_params, c, f0, rng)
        else:
            y = self._apply_nof0(self.run_params, c)
        wav_out = np.asarray(y[0])
        if mel.shape[0] != t_real:  # bucketed: trim back to the real length
            wav_out = wav_out[: t_real * int(self.hp["hop_size"])]
        if float(self.hp.get("vocoder_denoise_c", 0.0) or 0.0) > 0:
            from .vocoder_utils import denoise

            wav_out = denoise(wav_out, self.hp, v=self.hp["vocoder_denoise_c"])
        return wav_out

    @staticmethod
    def wav2spec(wav_fn, hp=None, return_linear: bool = False):
        from ..config.hparams import hparams as ghp
        from ..utils.audio_io import load_wav

        hp = hp or ghp
        wav, _ = load_wav(wav_fn, sr=hp["audio_sample_rate"]) \
            if isinstance(wav_fn, (str, os.PathLike)) or hasattr(wav_fn, "read") \
            else (np.asarray(wav_fn, np.float32), hp["audio_sample_rate"])
        return mel_ops.wav2spec(wav, hp)


@register_vocoder
class PWG(HifiGAN):
    """ParallelWaveGAN slot: shares the canonical 24 kHz wav2spec. The PWG
    generator weights path is wired via ``vocoders/pwg.py``."""

    def __init__(self, hp):  # pragma: no cover - requires external weights
        from .pwg import PWGGenerator

        self.hp = hp
        self.impl = PWGGenerator(hp)

    def spec2wav(self, mel, **kwargs):  # pragma: no cover
        return self.impl.spec2wav(mel, **kwargs)
