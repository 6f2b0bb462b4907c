"""FastSpeech2-family losses (reference training/task/fs2.py:34-266).

- ``mel_losses``: parses the ``mel_loss: "ssim:0.5|l1:0.5"`` spec and
  computes masked L1 / SSIM (bias +6, nonzero-speech weights) / MSE terms,
- duration loss (MSE in log domain, +1 offset),
- pitch (f0 L2/L1 + uv BCE) via pe_task.f0_uv_losses,
- energy loss (MSE, nonpadding masked).

Used by the fs2-full training path and validation metrics; the SVC task's
primary loss remains the diffusion noise loss.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..ops.ssim import ssim
from .pe_task import f0_uv_losses  # re-exported for pitch loss parity


def weights_nonzero_speech(target):
    """[B, T, M] -> [B, T, M] mask rows where the mel frame is nonzero."""
    dim = target.shape[-1]
    return (jnp.abs(target).sum(-1, keepdims=True) > 0).astype(target.dtype) \
        .repeat(dim, axis=-1)


def l1_loss(decoder_output, target):
    w = weights_nonzero_speech(target)
    return (jnp.abs(decoder_output - target) * w).sum() / jnp.maximum(w.sum(), 1)


def mse_loss(decoder_output, target):
    w = weights_nonzero_speech(target)
    return (((decoder_output - target) ** 2) * w).sum() / jnp.maximum(w.sum(), 1)


def ssim_loss(decoder_output, target, bias: float = 6.0):
    w = weights_nonzero_speech(target)
    s = 1.0 - ssim(decoder_output + bias, target + bias, size_average=False)
    return (s * w).sum() / jnp.maximum(w.sum(), 1)


def mel_losses(decoder_output, target, mel_loss_spec: str = "ssim:0.5|l1:0.5"
               ) -> Dict[str, jnp.ndarray]:
    """Parse 'name:weight|name:weight' and compute each weighted term."""
    out = {}
    for term in mel_loss_spec.split("|"):
        name, _, w = term.partition(":")
        weight = float(w) if w else 1.0
        if name == "l1":
            out["l1"] = l1_loss(decoder_output, target) * weight
        elif name in ("mse", "l2"):
            out["mse"] = mse_loss(decoder_output, target) * weight
        elif name == "ssim":
            out["ssim"] = ssim_loss(decoder_output, target) * weight
        else:
            raise ValueError(f"unknown mel loss {name}")
    return out


def dur_loss(dur_pred_log, mel2ph, txt_lengths, nonpadding):
    """MSE between predicted log-duration and log(dur+1) (fs2 'mse' mode)."""
    from ..models.tts_modules import mel2ph_to_dur

    T_txt = int(txt_lengths)
    dur_gt = mel2ph_to_dur(mel2ph, T_txt).astype(jnp.float32)
    loss = ((dur_pred_log - jnp.log(dur_gt + 1)) ** 2) * nonpadding
    return loss.sum() / jnp.maximum(nonpadding.sum(), 1)


def energy_loss(energy_pred, energy_gt, nonpadding):
    loss = ((energy_pred - energy_gt) ** 2) * nonpadding
    return loss.sum() / jnp.maximum(nonpadding.sum(), 1)
