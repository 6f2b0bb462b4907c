"""NSF source-signal variants (vendored parallel_wavegan models/source.py):
PulseGen (pulse train) and CyclicNoiseGen_v1 (cyclic noise). The harmonic
SineGen used by the shipped vocoders lives in vocoders/generator.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pulse_gen(rng, f0_up: jnp.ndarray, sr: int, pulse_amp: float = 0.1,
              noise_std: float = 0.003):
    """Pulse-train generator (reference models/source.py:140-202).

    One pulse per period (at the phase-wrap grid, standing in for the
    sine-maximum locations of SineGen(flag_for_pulse=True)), plus an onset
    pulse when voicing starts; Gaussian noise (std ``noise_std``) added AT
    pulse locations and in unvoiced regions only (source.py:198-201 —
    voiced non-pulse samples stay exactly zero).

    f0_up: [B, L] sample-rate f0. Returns (pulse_train, uv, noise).
    """
    rad = f0_up / sr
    phase = jnp.cumsum(rad, axis=1) % 1.0
    wrap = jnp.concatenate(
        [jnp.ones_like(phase[:, :1], dtype=bool),
         phase[:, 1:] < phase[:, :-1]], axis=1)
    uv = f0_up > 0
    uv_prev = jnp.concatenate(
        [jnp.zeros_like(uv[:, :1]), uv[:, :-1]], axis=1)
    loc = ((wrap | (uv & ~uv_prev)) & uv).astype(f0_up.dtype)
    uvf = uv.astype(f0_up.dtype)
    noise = jax.random.normal(rng, f0_up.shape, f0_up.dtype) * noise_std
    pulse_train = loc * pulse_amp + noise * (loc + (1.0 - uvf))
    return pulse_train, uvf, noise


def cyclic_noise_gen(rng, f0_up: jnp.ndarray, sr: int,
                     noise_std: float = 0.003, beta: float = 0.87,
                     f0_floor: float = 40.0):
    """Cyclic noise v1 (reference models/source.py:246-308): ONE fixed
    random kernel n[t] * exp(-t * f0_mean / (beta * sr)), truncated at
    -40 dB (t < 4.6 * sr / f0_mean), convolved with the noise-free pulse
    train — the same decayed-noise burst repeats at every pulse — plus
    plain noise in unvoiced regions.

    Returns (cyclic_noise, uv). ``f0_floor`` bounds the static kernel
    length for jit (reference uses a data-dependent length).
    """
    k1, k2 = jax.random.split(rng)
    pulse_train, uv, noise = pulse_gen(k1, f0_up, sr, pulse_amp=1.0,
                                       noise_std=noise_std)
    # reference quirk kept: pure_pulse = pulse_train - noise subtracts the
    # noise field everywhere, including where it was never added
    # (source.py:294)
    pure_pulse = pulse_train - noise

    f0_mean = (f0_up * uv).sum(axis=1) / jnp.maximum(uv.sum(axis=1), 1.0)
    f0_mean = jnp.maximum(f0_mean, f0_floor)  # guards the all-unvoiced case

    L = int(4.6 * sr / f0_floor) + 1  # static upper bound on kernel length
    t = jnp.arange(L, dtype=f0_up.dtype)
    kern_noise = jax.random.normal(k2, (L,), f0_up.dtype)

    def per_batch(pp, fm):
        mask = (t < 4.6 * sr / fm).astype(pp.dtype)
        decay = jnp.exp(-t * fm / beta / sr) * mask
        kern = kern_noise * noise_std * decay
        # causal convolution keeping the first L samples
        # (SignalsConv1d pads left by len(kern)-1, source.py:204-243)
        return jnp.convolve(pp, kern, mode="full")[: pp.shape[0]]

    cyc = jax.vmap(per_batch)(pure_pulse, f0_mean)
    return cyc + noise * (1.0 - uv), uv


def source_module_cyc_noise(rng, f0_up: jnp.ndarray, sr: int,
                            noise_std: float = 0.003, beta: float = 0.87,
                            voiced_threshold: float = 0.0):
    """SourceModuleCycNoise_v1 (reference models/source.py:444-483): the
    module-level merge wrapper over CyclicNoiseGen_v1.

    Returns (cyc, noise, uv) all [B, L]: the cyclic-noise harmonic source,
    a fresh Gaussian noise branch scaled ``noise_std / 3`` (source.py:479),
    and the voiced mask (f0 > voiced_threshold).
    """
    k1, k2 = jax.random.split(rng)
    f0_gated = jnp.where(f0_up > voiced_threshold, f0_up, 0.0)
    cyc, uv = cyclic_noise_gen(k1, f0_gated, sr, noise_std=noise_std,
                               beta=beta)
    noise = jax.random.normal(k2, uv.shape, f0_up.dtype) * noise_std / 3.0
    return cyc, noise, uv
