"""HuBERT-soft encoder wrapper: waveform/file -> [T, 256] soft units.

Parity target: reference ``preprocessing/hubertinfer.py`` — loads
``hubert_soft.pt`` (any ``*.pt`` under the configured dir), transparently
uses a precomputed sibling ``.npy`` when present, resamples to 16 kHz.
ContentVec (``use_vec``) is supported through the fairseq-HuBERT converter
when the checkpoint is available.
"""

from __future__ import annotations

import io
import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..models import hubert as hubert_model
from ..utils.audio_io import load_wav


class Hubertencoder:
    def __init__(self, pt_path: str = "checkpoints/hubert/hubert_soft.pt",
                 hp=None):
        self.hp = hp or {}
        self.cfg = hubert_model.HubertConfig()
        self.params = None
        self.use_vec = bool(self.hp.get("use_vec"))
        if self.use_vec:
            from ..models import contentvec

            vec_path = self.hp.get(
                "vec_path", "checkpoints/vec/checkpoint_best_legacy_500.pt")
            self._vec = contentvec
            if os.path.exists(vec_path):
                self.params = contentvec.load(vec_path, self.cfg)
                print(f"| Loaded ContentVec from {vec_path}")
            else:
                print(f"| WARNING: no ContentVec checkpoint at {vec_path}")
            return
        candidates = []
        p = Path(pt_path)
        if p.is_file():
            candidates = [p]
        elif p.parent.exists():
            candidates = sorted(p.parent.rglob("*.pt"))
        if candidates:
            self.params = hubert_model.load(str(candidates[0]), self.cfg)
            print(f"| Loaded HuBERT-soft from {candidates[0]}")
        else:
            print(f"| WARNING: no HuBERT checkpoint under {pt_path}; "
                  "encode() will fail unless .npy sibling features exist.")

    def encode(self, wav_path) -> np.ndarray:
        """wav path / BytesIO / float array at any rate -> [T, 256] units."""
        npy_path = ""
        if isinstance(wav_path, io.BytesIO):
            wav_path.seek(0)
        elif isinstance(wav_path, (str, os.PathLike)):
            npy_path = Path(wav_path).with_suffix(".npy")
        if npy_path and os.path.exists(npy_path):
            return np.load(str(npy_path))
        if isinstance(wav_path, np.ndarray):
            wav16k = wav_path  # caller guarantees 16 kHz
        else:
            wav16k, _ = load_wav(wav_path, sr=16000)
        if self.params is None:
            raise FileNotFoundError("HuBERT/ContentVec checkpoint not loaded")
        # length bucketing: pad to 0.4 s multiples (one compile per bucket),
        # trim units back to the true 50 Hz frame count
        return self._encode_wav16(wav16k)

    def encode_batch(self, wav16k_batch) -> "np.ndarray":
        """Batched encode: [B, L] 16 kHz (already same-length/padded) ->
        [B, T, 256]. Used by the batched binarizer."""
        if self.params is None:
            raise FileNotFoundError("HuBERT/ContentVec checkpoint not loaded")
        wavs = jnp.asarray(np.asarray(wav16k_batch, np.float32))
        if self.use_vec:
            units = self._vec.units(self.params, self.cfg, wavs)
        else:
            units = hubert_model.units(self.params, self.cfg, wavs)
        return np.asarray(units)

    def _encode_wav16(self, wav16k) -> "np.ndarray":
        true_units = max(len(wav16k) // 320, 1)
        bucket = 6400  # 0.4 s at 16 kHz = 20 unit frames
        pad_len = -(-len(wav16k) // bucket) * bucket
        wav16k = np.pad(np.asarray(wav16k, np.float32),
                        (0, pad_len - len(wav16k)))
        if self.use_vec:
            units = self._vec.units(self.params, self.cfg, jnp.asarray(wav16k)[None])
        else:
            units = hubert_model.units(self.params, self.cfg, jnp.asarray(wav16k)[None])
        return np.asarray(units[0, :true_units])
