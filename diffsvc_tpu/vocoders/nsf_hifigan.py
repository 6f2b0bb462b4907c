"""44.1 kHz NSF-HiFiGAN vocoder wrapper.

Parity: reference ``network/vocoders/nsf_hifigan.py`` — loads an openvpi
checkpoint (sibling ``config.json`` + ``generator`` state dict), warns on
config mismatches, converts log10-mel -> ln-mel (*2.30259) before the
generator, and its ``wav2spec`` is the nvSTFT ln-mel converted to log10
(*0.434294).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import mel as mel_ops
from ..utils import convert_torch as cvt
from ..utils.audio_io import load_wav_nsf
from . import generator
from .base import BaseVocoder, register_vocoder


def load_model(model_path: str):
    config_file = os.path.join(os.path.split(model_path)[0], "config.json")
    with open(config_file, encoding="utf-8") as f:
        h = json.load(f)
    ckpt = cvt.torch_load(model_path)
    state = {k: cvt._to_np(v) for k, v in ckpt["generator"].items()}
    cfg = generator.HifiGanConfig.from_dict(h, use_nsf=True)
    params = cvt.convert_hifigan_generator(state, cfg)
    print(f"| Loaded NSF-HiFiGAN from {model_path}")
    return params, cfg, h


@register_vocoder
class NsfHifiGAN(BaseVocoder):
    def __init__(self, hp):
        self.hp = hp
        model_path = hp["vocoder_ckpt"]
        if os.path.exists(model_path):
            self.params, self.cfg, self.h = load_model(model_path)
            self._check_params()
            generator.setup_serving(self, hp)
        else:
            print("Error: NSF-HiFiGAN model file is not found!")

    def _check_params(self):
        pairs = [("sampling_rate", "audio_sample_rate"), ("num_mels", "audio_num_mel_bins"),
                 ("n_fft", "fft_size"), ("win_size", "win_size"),
                 ("hop_size", "hop_size"), ("fmin", "fmin"), ("fmax", "fmax")]
        for hk, pk in pairs:
            if hk in self.h and self.h[hk] != self.hp.get(pk):
                print(f"Mismatch parameters: hparams['{pk}']={self.hp.get(pk)}"
                      f" != {self.h[hk]} (vocoder)")

    def spec2wav(self, mel, **kwargs):
        """mel [T, M] log10-mel -> wav. log10 -> ln conversion inside."""
        from .hifigan import bucket_mel_f0

        mel, f0, t_real = bucket_mel_f0(self.hp, mel, kwargs.get("f0"))
        c = jnp.asarray(mel)[None] * mel_ops.LN_10
        if f0 is not None and self.hp.get("use_nsf"):
            f0 = jnp.asarray(np.asarray(f0, np.float32))[None]
            rng = jax.random.PRNGKey(kwargs.get("seed", 0))
            y = self._apply(self.run_params, c, f0, rng)
        else:
            y = self._apply_nof0(self.run_params, c)
        wav_out = np.asarray(y[0])
        if mel.shape[0] != t_real:  # bucketed: trim back to the real length
            wav_out = wav_out[: t_real * int(self.hp["hop_size"])]
        return wav_out

    @staticmethod
    def wav2spec(inp_path, hp=None):
        from ..config.hparams import hparams as ghp

        hp = hp or ghp
        if isinstance(inp_path, (str, os.PathLike)) or hasattr(inp_path, "read"):
            wav, _ = load_wav_nsf(inp_path, target_sr=hp["audio_sample_rate"])
        else:
            wav = np.asarray(inp_path, np.float32)
        mel = np.asarray(mel_ops.wav2mel_nsf(
            jnp.asarray(wav), sr=hp["audio_sample_rate"], n_fft=hp["fft_size"],
            hop=hp["hop_size"], win_length=hp["win_size"],
            n_mels=hp["audio_num_mel_bins"], fmin=float(hp["fmin"]),
            fmax=float(hp["fmax"])))
        return wav, mel
