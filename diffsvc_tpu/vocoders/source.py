"""NSF source-signal variants (vendored parallel_wavegan models/source.py):
PulseGen (pulse train) and CyclicNoiseGen_v1 (cyclic noise). The harmonic
SineGen used by the shipped vocoders lives in vocoders/generator.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .generator import sine_gen


def pulse_gen(rng, f0_up: jnp.ndarray, sr: int, pulse_amp: float = 0.1,
              noise_std: float = 0.003):
    """Pulse train: one unit impulse per period at voiced frames, noise in
    unvoiced regions. f0_up: [B, L] sample-rate f0."""
    rad = (f0_up / sr)
    phase = jnp.cumsum(rad, axis=1) % 1.0
    # pulse where the phase wraps
    wrap = jnp.concatenate(
        [jnp.ones_like(phase[:, :1]),
         (phase[:, 1:] - phase[:, :-1] < 0).astype(phase.dtype)], axis=1)
    uv = (f0_up > 0).astype(phase.dtype)
    noise = jax.random.normal(rng, f0_up.shape) * (
        uv * noise_std + (1 - uv) * pulse_amp / 3.0)
    return wrap * uv * pulse_amp + noise, uv


def cyclic_noise_gen(rng, f0_up: jnp.ndarray, sr: int, amp: float = 0.1,
                     noise_std: float = 0.003, beta: float = 0.87):
    """Cyclic noise: noise amplitude-modulated by a per-period decaying
    envelope exp(-t*beta/period) restarting at each pulse."""
    k1, k2 = jax.random.split(rng)
    pulses, uv = pulse_gen(k1, f0_up, sr, pulse_amp=1.0, noise_std=0.0)

    # envelope = decaying exponential since the last pulse
    decay = jnp.exp(-f0_up * beta / sr)  # per-sample decay for each period

    def scan_fn(carry, inp):
        env_prev = carry
        pulse, d = inp
        env = jnp.where(pulse > 0, 1.0, env_prev * d)
        return env, env

    def per_batch(pulse_row, decay_row):
        _, env = jax.lax.scan(scan_fn, jnp.zeros(()), (pulse_row, decay_row))
        return env

    env = jax.vmap(per_batch)(pulses, decay)
    noise = jax.random.normal(k2, f0_up.shape)
    uv_noise = jax.random.normal(jax.random.fold_in(k2, 1), f0_up.shape)
    return env * noise * amp * uv + (1 - uv) * uv_noise * noise_std, uv
