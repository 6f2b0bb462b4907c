"""f0 <-> coarse-bin conversions and log2 normalization.

Numerics match the reference (``utils/pitch_utils.py:17-76``): 256 mel-scale
pitch bins in [1, 255], log2 normalization with linear interpolation over
unvoiced regions, and 2**f0 denormalization with uv/padding zeroing.

All functions are pure and jittable; numpy twins are provided for the
host-side preprocessing path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def f0_to_coarse(f0, f0_bin: int = 256, f0_min: float = 50.0, f0_max: float = 1100.0):
    """Quantize f0 (Hz) to coarse mel-scale bins in [1, f0_bin-1]; 0 Hz -> bin 1.

    Matches reference ``utils/pitch_utils.py:17-31`` (np.rint rounding).
    """
    xp = jnp if isinstance(f0, jnp.ndarray) else np
    if xp is np:
        from ..native import runtime as native

        if native.available():
            return native.f0_to_coarse(
                np.asarray(f0, np.float32).ravel(), int(f0_bin),
                float(f0_min), float(f0_max)).reshape(np.shape(f0)).astype(int)
    f0_mel_min = 1127.0 * np.log(1 + f0_min / 700.0)
    f0_mel_max = 1127.0 * np.log(1 + f0_max / 700.0)
    f0_mel = 1127.0 * xp.log(1 + f0 / 700.0)
    scaled = (f0_mel - f0_mel_min) * (f0_bin - 2) / (f0_mel_max - f0_mel_min) + 1
    f0_mel = xp.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = xp.clip(f0_mel, 1, f0_bin - 1)
    if xp is jnp:
        coarse = jnp.rint(f0_mel).astype(jnp.int32)
    else:
        coarse = np.rint(f0_mel).astype(int)
    return coarse


def norm_f0(f0, uv=None, pitch_norm: str = "log", use_uv: bool = False,
            f0_mean: float = 0.0, f0_std: float = 1.0):
    """log2 (or standard) normalization; zero unvoiced when use_uv."""
    xp = jnp if isinstance(f0, jnp.ndarray) else np
    if pitch_norm == "standard":
        f0 = (f0 - f0_mean) / f0_std
    if pitch_norm == "log":
        f0 = xp.log2(f0)
    if uv is not None and use_uv:
        f0 = xp.where(uv > 0, 0.0, f0)
    return f0


def norm_interp_f0_np(f0: np.ndarray, pitch_norm: str = "log", use_uv: bool = False,
                      f0_mean: float = 0.0, f0_std: float = 1.0):
    """log2-normalize then linearly interpolate over unvoiced frames.

    Host-side (numpy) — used by the dataset/__getitem__ path like reference
    ``utils/pitch_utils.py:45-60``. Returns (f0_norm, uv) as float32.
    """
    f0 = np.asarray(f0, dtype=np.float64)
    uv = f0 == 0
    with np.errstate(divide="ignore"):
        f0 = norm_f0(f0, uv, pitch_norm=pitch_norm, use_uv=use_uv,
                     f0_mean=f0_mean, f0_std=f0_std)
    if uv.sum() == len(f0):
        f0[uv] = 0.0
    elif uv.sum() > 0:
        f0[uv] = np.interp(np.where(uv)[0], np.where(~uv)[0], f0[~uv])
    return f0.astype(np.float32), uv.astype(np.float32)


def denorm_f0(f0, uv=None, pitch_norm: str = "log", use_uv: bool = False,
              pitch_padding=None, f0_mean: float = 0.0, f0_std: float = 1.0,
              min=None, max=None):
    """Invert norm_f0: 2**f0; zero uv/padded positions.

    Matches reference ``utils/pitch_utils.py:63-76``.
    """
    xp = jnp if isinstance(f0, jnp.ndarray) else np
    if pitch_norm == "standard":
        f0 = f0 * f0_std + f0_mean
    if pitch_norm == "log":
        f0 = 2.0 ** f0
    if min is not None:
        f0 = xp.clip(f0, min, None)
    if max is not None:
        f0 = xp.clip(f0, None, max)
    if uv is not None and use_uv:
        f0 = xp.where(uv > 0, 0.0, f0)
    if pitch_padding is not None:
        f0 = xp.where(pitch_padding, 0.0, f0)
    return f0


def energy_to_coarse(energy):
    """clamp(energy*256//4, max=255) as int bins (reference fs2.py:240-247)."""
    xp = jnp if isinstance(energy, jnp.ndarray) else np
    bins = xp.clip((energy * 256) // 4, None, 255)
    return bins.astype(jnp.int32 if xp is jnp else np.int64)
