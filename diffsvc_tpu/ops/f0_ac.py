"""Praat-style autocorrelation f0 tracker (Boersma 1993), TPU-native.

Replaces the reference's parselmouth/Praat C++ dependency
(``preprocessing/data_gen_utils.py:152-188``: ``to_pitch_ac(time_step=hop/sr,
voicing_threshold=0.6, pitch_floor=f0_min, pitch_ceiling=f0_max)``).

Pipeline (all jittable):
  1. frame the signal on Praat's midpoint-centred grid,
  2. per-frame normalized autocorrelation via rFFT (r_x / r_window),
  3. candidate peaks with parabolic interpolation + octave cost,
  4. Viterbi path search (``jax.lax.scan``) with Praat's default costs,
  5. voiced frames -> f0 Hz, unvoiced -> 0.

Constants follow Praat's published defaults for the AC method:
periods_per_window=3, silence_threshold=0.03, octave_cost=0.01,
octave_jump_cost=0.35, voiced_unvoiced_cost=0.14, and the caller-set
voicing_threshold=0.6.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mel import hann_window
from .pitch import f0_to_coarse

MAX_CANDIDATES = 15

PERIODS_PER_WINDOW = 3.0
SILENCE_THRESHOLD = 0.03
OCTAVE_COST = 0.01
OCTAVE_JUMP_COST = 0.35
VOICED_UNVOICED_COST = 0.14


def _praat_frame_grid(n_samples: int, sr: float, dt: float, window_len_s: float):
    """Praat Sampled_shortTermAnalysis: number of frames and first centre."""
    duration = n_samples / sr
    n_frames = int(np.floor((duration - window_len_s) / dt)) + 1
    n_frames = max(n_frames, 1)
    t1 = 0.5 * (duration - (n_frames - 1) * dt)
    return n_frames, t1


@functools.partial(jax.jit, static_argnames=("sr", "hop", "n_frames", "win_samples", "fft_size", "start0"))
def _frame_acf(wav, *, sr: int, hop: int, n_frames: int, win_samples: int,
               fft_size: int, start0: int):
    """Extract midpoint-centred frames and normalized autocorrelation.

    Returns (r [n_frames, max_lag+1], local_peak [n_frames]).
    """
    # Frames (centre of frame i = start0 + i*hop in samples), built
    # gather-free: zero-pad so every frame is in-bounds (zeros outside the
    # signal, matching the old valid-mask), then reshape into [*, hop]
    # blocks and concatenate shifted block views (cheap slices on TPU
    # instead of a multi-million-element gather; see ops/mel.frame_signal).
    pad_left = max(0, -start0)
    base = start0 + pad_left
    q, rem = divmod(win_samples, hop)
    q_blocks = q + (1 if rem else 0)
    need = (n_frames - 1 + q_blocks) * hop
    n_in = int(wav.shape[0])
    xp = jnp.pad(wav, (pad_left, max(0, base + need - n_in - pad_left)))
    blocks = xp[base: base + need].reshape(-1, hop)
    parts = [blocks[k: k + n_frames] for k in range(q)]
    if rem:
        parts.append(blocks[q: q + n_frames, :rem])
    frames = jnp.concatenate(parts, axis=1)

    frames = frames - frames.mean(axis=1, keepdims=True)
    local_peak = jnp.abs(frames).max(axis=1)

    win = jnp.asarray(hann_window(win_samples))
    fw = frames * win[None, :]

    # Sample ACF via rFFT power spectrum.
    spec = jnp.fft.rfft(fw, n=fft_size, axis=1)
    acf = jnp.fft.irfft(spec.real**2 + spec.imag**2, n=fft_size, axis=1)
    acf = acf / jnp.maximum(acf[:, :1], 1e-12)

    # Window ACF (normalization denominator), same transform.
    wspec = jnp.fft.rfft(win[None, :], n=fft_size, axis=1)
    wacf = jnp.fft.irfft(wspec.real**2 + wspec.imag**2, n=fft_size, axis=1)
    wacf = wacf / jnp.maximum(wacf[:, :1], 1e-12)

    max_lag = win_samples // 2
    r = acf[:, : max_lag + 1] / jnp.maximum(wacf[:, : max_lag + 1], 1e-6)
    return r, local_peak


@jax.jit
def _find_candidates(r, local_peak, global_peak, sr, f0_min, f0_max,
                     voicing_threshold):
    """Top-K local maxima of r(tau) -> candidate (freq, strength) per frame.

    Candidate 0 is always the unvoiced candidate.
    """
    n_frames, n_lags = r.shape
    lag = jnp.arange(n_lags, dtype=jnp.float32)

    lag_min = sr / f0_max
    lag_max = sr / f0_min

    left = jnp.concatenate([r[:, :1], r[:, :-1]], axis=1)
    right = jnp.concatenate([r[:, 1:], r[:, -1:]], axis=1)
    is_peak = (r > left) & (r >= right) & (lag[None, :] >= jnp.maximum(lag_min, 2.0)) \
        & (lag[None, :] <= jnp.minimum(lag_max, n_lags - 2))

    # Parabolic interpolation around each lag for peak position & height.
    denom = left - 2.0 * r + right
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (left - right) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    peak_lag = lag[None, :] + delta
    peak_val = r - 0.25 * (left - right) * delta

    freq = sr / jnp.maximum(peak_lag, 1e-6)
    # Strength with octave cost (Boersma eq. 24):
    # R = r(tau) - OctaveCost * log2(pitch_floor * tau_seconds * ... ) with the
    # convention that higher candidates are penalized relative to the floor.
    # Praat reflects normalized-ACF peaks above 1 (r -> 1/r): values > 1 come
    # from the window-ACF division and indicate an unreliable maximum.
    peak_val = jnp.where(peak_val > 1.0,
                         1.0 / jnp.maximum(peak_val, 1e-6), peak_val)

    # R = r(tau) - OctaveCost * log2(pitch_floor * tau): smaller tau (higher
    # f0) gets a bonus, discouraging subharmonic octave errors.
    tau_sec = jnp.maximum(peak_lag, 1e-6) / sr
    strength = peak_val - OCTAVE_COST * jnp.log2(f0_min * tau_sec)
    strength = jnp.where(is_peak, strength, -jnp.inf)

    top_s, top_i = jax.lax.top_k(strength, MAX_CANDIDATES - 1)
    top_f = jnp.take_along_axis(freq, top_i, axis=1)
    top_r = jnp.take_along_axis(peak_val, top_i, axis=1)

    # Unvoiced candidate strength (Boersma eq. 23).
    intensity = jnp.minimum(local_peak / jnp.maximum(global_peak, 1e-12), 1.0)
    unvoiced_strength = voicing_threshold + jnp.maximum(
        0.0, 2.0 - intensity / (SILENCE_THRESHOLD / (1.0 + voicing_threshold)))

    # Voiced candidates below absolute voicing floor behave as invalid.
    cand_freq = jnp.concatenate([jnp.zeros((n_frames, 1)), top_f], axis=1)
    cand_strength = jnp.concatenate([unvoiced_strength[:, None], top_s], axis=1)
    cand_valid = jnp.concatenate(
        [jnp.ones((n_frames, 1), bool), jnp.isfinite(top_s) & (top_r > 0.0)], axis=1)
    cand_strength = jnp.where(cand_valid, cand_strength, -1e9)
    return cand_freq, cand_strength


def _trans_cost(f_prev, v_prev, f_cur, v_cur, ojc, vuc):
    both_voiced = v_prev & v_cur
    jump = jnp.abs(jnp.log2(jnp.maximum(f_prev, 1e-6) / jnp.maximum(f_cur, 1e-6)))
    return jnp.where(both_voiced, ojc * jump,
                     jnp.where(v_prev == v_cur, 0.0, vuc))


@jax.jit
def _viterbi_scan(cand_freq, cand_strength, time_step_correction):
    """Sequential-scan Viterbi (reference implementation for parity tests;
    :func:`_viterbi` is the parallel version used in production)."""
    n_frames, n_cand = cand_freq.shape
    voiced = cand_freq > 0

    ojc = OCTAVE_JUMP_COST * time_step_correction
    vuc = VOICED_UNVOICED_COST * time_step_correction

    # carry = (score, prev_f, prev_v); emits backpointers per frame.
    def scan_step(carry, inp):
        prev_score, pf, pv = carry
        f, s, v = inp
        cost = _trans_cost(pf[:, None], pv[:, None], f[None, :], v[None, :],
                           ojc, vuc)
        total = prev_score[:, None] - cost + s[None, :]
        best_prev = jnp.argmax(total, axis=0)
        score = jnp.max(total, axis=0)
        return (score, f, v), best_prev

    init = (cand_strength[0], cand_freq[0], voiced[0])
    (final_score, _, _), back = jax.lax.scan(
        scan_step, init, (cand_freq[1:], cand_strength[1:], voiced[1:]))

    last = jnp.argmax(final_score)

    def backtrack(carry, bp):
        idx = carry
        prev = bp[idx]
        return prev, idx

    # reverse scan emits the CURRENT node while stepping to its
    # predecessor, so ys = [idx_1..idx_{n-1}] and the final carry is
    # frame 0's index — it belongs at the FRONT of the path
    first, path_rev = jax.lax.scan(backtrack, last, back, reverse=True)
    path = jnp.concatenate([first[None], path_rev])
    return path


@jax.jit
def _viterbi(cand_freq, cand_strength, time_step_correction):
    """Viterbi via max-plus associative scan — O(log T) depth on TPU.

    The sequential DP ``score_t[j] = max_i score_{t-1}[i] - cost(i,j) + s_t[j]``
    is a max-plus vector-matrix product, and max-plus matrix products are
    associative, so a :func:`jax.lax.associative_scan` over the per-frame
    transition matrices ``M_t[i,j] = -cost_t(i,j) + s_t[j]`` yields every
    frame's forward scores in ~log2(T) parallel levels of batched 15x15
    max-plus matmuls, instead of T tiny sequential scan steps (which are
    per-step-latency bound on TPU).  Backtracking composes the per-frame
    backpointer maps with a second (reverse) associative scan.

    Same optimum as :func:`_viterbi_scan`; path sums are accumulated in a
    tree order, so exact ties between competing paths may resolve
    differently at fp32 (parity on real audio is asserted in
    tests/test_pitch.py).
    """
    n_frames, n_cand = cand_freq.shape
    if n_frames == 1:
        return jnp.argmax(cand_strength[0])[None]
    voiced = cand_freq > 0

    ojc = OCTAVE_JUMP_COST * time_step_correction
    vuc = VOICED_UNVOICED_COST * time_step_correction

    # Per-step transition matrices M_t (t = 1..T-1): [T-1, C, C].
    cost = _trans_cost(cand_freq[:-1, :, None], voiced[:-1, :, None],
                       cand_freq[1:, None, :], voiced[1:, None, :], ojc, vuc)
    m = -cost + cand_strength[1:, None, :]

    def maxplus(a, b):  # (A (x) B)[i,k] = max_j A[i,j] + B[j,k]
        return jnp.max(a[..., :, :, None] + b[..., None, :, :], axis=-2)

    prefix = jax.lax.associative_scan(maxplus, m)          # [T-1, C, C]
    # forward scores at frames 1..T-1: fold the frame-0 scores in
    scores = jnp.max(cand_strength[0][None, :, None] + prefix, axis=1)
    scores_all = jnp.concatenate([cand_strength[:1], scores])   # [T, C]

    # Backpointers, vectorized over t: bp[t-1][j] = best predecessor (at
    # frame t-1) of candidate j at frame t — identical formula to the
    # sequential scan step, so tie-breaking (lowest index) matches.
    bp = jnp.argmax(scores_all[:-1][:, :, None] + m, axis=1)    # [T-1, C]

    # Suffix-compose the backpointer maps: S_t = g_t o g_{t+1} o ... so the
    # whole path is S_t[last]. With reverse=True the combine receives the
    # HIGHER-index operand first, so the map composition must be
    # (a, b) -> b o a, i.e. x -> b[a[x]] (associative: both groupings give
    # c o b o a).
    def compose(a, b):
        return jnp.take_along_axis(b, a, axis=-1)

    suffix = jax.lax.associative_scan(compose, bp, reverse=True)
    last = jnp.argmax(scores_all[-1])
    path = jnp.concatenate([suffix[:, last], last[None]])
    return path


@functools.partial(jax.jit, static_argnames=("sr", "hop", "n_frames",
                                              "win_samples", "fft_size",
                                              "start0"))
def _track(wav, *, sr, hop, n_frames, win_samples, fft_size, start0,
           f0_min, f0_max, voicing_threshold, tsc):
    """Full tracker in ONE device dispatch: ACF -> candidates -> Viterbi ->
    per-frame f0 (voiced) / 0 (unvoiced)."""
    r, local_peak = _frame_acf.__wrapped__(
        wav, sr=sr, hop=hop, n_frames=n_frames, win_samples=win_samples,
        fft_size=fft_size, start0=start0)
    global_peak = jnp.abs(wav - wav.mean()).max()
    cand_freq, cand_strength = _find_candidates.__wrapped__(
        r, local_peak, global_peak, float(sr), f0_min, f0_max,
        voicing_threshold)
    path = _viterbi.__wrapped__(cand_freq, cand_strength, tsc)
    return jnp.take_along_axis(cand_freq, path[:, None], axis=1)[:, 0]


def get_pitch_ac(wav: np.ndarray, mel_len: int, hp) -> tuple:
    """parselmouth-compatible entry: (f0 [mel_len], coarse [mel_len]).

    Frame-grid and output padding replicate the reference glue
    (``data_gen_utils.py:152-188``): the Praat track is centred into the mel
    timeline with ``pad = (len(wav)//hop - len(f0) + 1)//2``.
    """
    sr = hp["audio_sample_rate"]
    hop = hp["hop_size"]
    f0_min, f0_max = float(hp["f0_min"]), float(hp["f0_max"])
    voicing_threshold = 0.6
    dt = hop / sr

    # Length bucketing: zero-pad the tail so the jitted tracker compiles one
    # program per bucket, not per clip length. The Praat grid is midpoint-
    # centred, so padding shifts frame centres by < dt/2 (sub-frame);
    # wav_bucket_frames: 1 restores exact reference timing.
    bucket = int(hp.get("wav_bucket_frames", 128) or 1)
    true_len = len(wav)
    if bucket > 1:
        pad_len = -(-true_len // (bucket * hop)) * (bucket * hop)
        if pad_len != true_len:
            wav = np.pad(np.asarray(wav), (0, pad_len - true_len))

    window_len_s = PERIODS_PER_WINDOW / f0_min
    win_samples = int(round(window_len_s * sr))
    n_frames, t1 = _praat_frame_grid(len(wav), sr, dt, window_len_s)
    # first frame spans [t1 - wl/2, t1 + wl/2]
    start0 = int(round((t1 - window_len_s / 2) * sr))

    fft_size = int(2 ** np.ceil(np.log2(2 * win_samples)))
    wav_j = jnp.asarray(np.asarray(wav, np.float32))
    f0 = np.asarray(_track(
        wav_j, sr=sr, hop=hop, n_frames=n_frames, win_samples=win_samples,
        fft_size=fft_size, start0=start0, f0_min=f0_min, f0_max=f0_max,
        voicing_threshold=voicing_threshold, tsc=0.01 / dt))

    # Pad onto the mel grid exactly like the reference.
    pad_size = (int(len(wav) // hop) - len(f0) + 1) // 2
    rpad = mel_len - len(f0) - pad_size
    if rpad < 0:
        f0 = f0[: len(f0) + rpad]
        rpad = 0
    if pad_size < 0:
        f0 = f0[-pad_size:]
        pad_size = 0
    f0 = np.pad(f0, (pad_size, rpad), mode="constant")
    f0 = f0[:mel_len]
    coarse = f0_to_coarse(f0, hp["f0_bin"], f0_min, f0_max)
    return f0.astype(np.float32), coarse
