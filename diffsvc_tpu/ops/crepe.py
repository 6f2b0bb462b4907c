"""CREPE pitch tracker ('full' model) in JAX + torchcrepe weight converter.

Replaces the reference's torchcrepe dependency
(``preprocessing/data_gen_utils.py:191-230``): 16 kHz input, hop 80 (5 ms),
1024-sample z-scored frames -> 6 conv(BN, relu, maxpool2) layers -> 2048 ->
sigmoid over 360 pitch bins (20-cent resolution from 32.70 Hz).

The reference filtering chain is kept: median(periodicity, 3), silence
threshold -60 dB A-weighted loudness (torchcrepe loudness.a_weighted,
re-derived librosa-free below), periodicity threshold, mean(f0, 3),
NaN->0, then linear interpolation of voiced f0 onto mel frame times.

Decoding: Viterbi over the 360-bin posteriors (lax.scan) with the standard
band-limited transition prior, plus weighted-average refinement in cents.

Weights: ``load_crepe('path/to/full.pth')`` converts a torchcrepe state
dict. With no weights available, ``get_pitch_crepe`` raises and callers
fall back to the AC tracker (data/features.py).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pitch import f0_to_coarse

SR = 16000
HOP = 80
WINDOW = 1024
N_BINS = 360
CENTS_PER_BIN = 20.0
CENTS_OFFSET = 1997.3794084376191

# 'full' capacity
FILTERS = [1024, 128, 128, 128, 256, 512]
KERNELS = [512, 64, 64, 64, 64, 64]
STRIDES = [4, 1, 1, 1, 1, 1]

_model_cache: Dict[str, Dict] = {}


def bins_to_cents(bins):
    return CENTS_PER_BIN * bins + CENTS_OFFSET


def cents_to_frequency(cents):
    return 10.0 * 2 ** (cents / 1200.0)


def init(key):
    from ..models import nn

    keys = iter(jax.random.split(key, 16))
    layers = []
    c_in = 1
    for f, k, s in zip(FILTERS, KERNELS, STRIDES):
        layers.append({
            "conv": nn.init_conv1d(next(keys), k, c_in, f),
            "bn": {"scale": jnp.ones((f,)), "bias": jnp.zeros((f,)),
                   "mean": jnp.zeros((f,)), "var": jnp.ones((f,))},
        })
        c_in = f
    return {"layers": layers,
            "classifier": nn.init_linear(next(keys), 2048, N_BINS)}


@jax.jit
def forward(params, frames):
    """frames [N, 1024] z-scored -> probabilities [N, 360]."""
    from ..models import nn

    x = frames[:, :, None]  # [N, T, C=1]
    for lp, k, s in zip(params["layers"], KERNELS, STRIDES):
        # torchcrepe zero-pads to 'same' before each conv: (254, 254) for
        # the k=512 s=4 first layer, (31, 32) — LOW side first — for the
        # k=64 s=1 layers (torchcrepe model.py layer() default padding)
        pad_lo = (k - s) // 2 if s > 1 else (k - 1) // 2
        pad_hi = k - s - pad_lo if s > 1 else k // 2
        xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0)))
        x = nn.conv1d(lp["conv"], xp, stride=s, padding=0)
        x = jax.nn.relu(x)
        inv = jax.lax.rsqrt(lp["bn"]["var"] + 1e-5)
        x = (x - lp["bn"]["mean"]) * inv * lp["bn"]["scale"] + lp["bn"]["bias"]
        # max pool 2 along time
        t = x.shape[1] - (x.shape[1] % 2)
        x = x[:, :t].reshape(x.shape[0], t // 2, 2, x.shape[2]).max(axis=2)
    # time-major flatten (t*C + c): torchcrepe permutes [N,C,T,1] ->
    # [N,T,C,1] before reshape, which is exactly [N,T,C].reshape here —
    # the converted classifier weights expect this in-feature order
    x = x.reshape(x.shape[0], -1)
    logits = nn.linear(params["classifier"], x)
    return jax.nn.sigmoid(logits)


def frame_audio(wav16k: np.ndarray, hop: int = HOP):
    """Centered 1024 frames every hop samples, z-scored per frame."""
    pad = WINDOW // 2
    w = np.pad(wav16k, (pad, pad))
    n_frames = 1 + len(wav16k) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(WINDOW)[None, :]
    idx = np.clip(idx, 0, len(w) - 1)
    frames = w[idx].astype(np.float32)
    mean = frames.mean(axis=1, keepdims=True)
    std = np.maximum(frames.std(axis=1, keepdims=True), 1e-10)
    return (frames - mean) / std


def a_weighting_db(freqs: np.ndarray, min_db: float = -80.0) -> np.ndarray:
    """IEC 61672 A-weighting curve in dB (librosa.A_weighting re-derivation;
    0 dB at 1 kHz by construction of the +2.0 normalization term)."""
    f_sq = np.asarray(freqs, np.float64) ** 2
    const = np.array([12194.217, 20.598997, 107.65265, 737.86223]) ** 2
    with np.errstate(divide="ignore"):
        w = 2.0 + 20.0 * (
            np.log10(const[0]) + 2 * np.log10(np.maximum(f_sq, 0))
            - np.log10(f_sq + const[0]) - np.log10(f_sq + const[1])
            - 0.5 * np.log10(f_sq + const[2]) - 0.5 * np.log10(f_sq + const[3]))
    return np.maximum(w, min_db)


_A_REF_DB = 20.0    # torchcrepe loudness.REF_DB
_A_MIN_DB = -100.0  # torchcrepe loudness.MIN_DB


def a_weighted_loudness(wav16k: np.ndarray, hop: int = HOP,
                        n_fft: int = WINDOW) -> np.ndarray:
    """Per-frame A-weighted perceptual loudness following torchcrepe
    loudness.a_weighted: centered periodic-Hann STFT, librosa
    amplitude_to_db (ref 1, amin 1e-5, top_db 80 vs the global max),
    + (A-weighting - 20 dB ref), floor -100 dB, mean over bins.

    Padding-mode caveat: this uses ZERO padding at the edges, while
    librosa/torch STFT defaults vary by version (librosa pads 'constant'
    for stft but torchcrepe routes through librosa with its defaults) —
    edge frames can therefore differ slightly, which only matters when a
    frame sits exactly at the -60 dB silence-gate threshold.  Interior
    frames are unaffected."""
    pad = n_fft // 2
    w = np.pad(np.asarray(wav16k, np.float64), (pad, pad))
    n_frames = 1 + len(wav16k) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    mag = np.abs(np.fft.rfft(w[idx] * hann, axis=1))
    db = 20.0 * np.log10(np.maximum(mag, 1e-5))
    db = np.maximum(db, db.max() - 80.0)
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / SR)
    weighted = db + (a_weighting_db(freqs) - _A_REF_DB)[None, :]
    return np.maximum(weighted, _A_MIN_DB).mean(axis=1).astype(np.float32)


def _viterbi(probs: jnp.ndarray, transition_width: int = 12):
    """Max-product decode over bins; band-limited transition prior."""
    n = probs.shape[1]
    d = jnp.abs(jnp.arange(n)[:, None] - jnp.arange(n)[None, :])
    trans = jnp.maximum(transition_width - d, 0).astype(jnp.float32)
    trans = trans / trans.sum(axis=1, keepdims=True)
    log_trans = jnp.log(jnp.maximum(trans, 1e-12))
    # torchcrepe decode.viterbi applies softmax to the (sigmoid) network
    # output before the librosa viterbi — NOT plain sum-normalization
    log_obs = jax.nn.log_softmax(probs, axis=1)

    def step(carry, obs):
        score = carry
        total = score[:, None] + log_trans
        best_prev = jnp.argmax(total, axis=0)
        score = jnp.max(total, axis=0) + obs
        return score, best_prev

    init_score = log_obs[0] - np.log(n)
    final, back = jax.lax.scan(step, init_score, log_obs[1:])
    last = jnp.argmax(final)

    def backtrack(idx, bp):
        return bp[idx], idx

    # final carry = frame 0's bin; emitted ys cover frames 1..n-1
    first, path_rev = jax.lax.scan(backtrack, last, back, reverse=True)
    return jnp.concatenate([first[None], path_rev])


def decode(probs: jnp.ndarray):
    """probs [N, 360] -> (f0 Hz [N], periodicity [N]) via Viterbi +
    weighted-average cents refinement over a +/-4-bin window."""
    bins = _viterbi(probs)
    n = probs.shape[1]
    offs = jnp.arange(-4, 5)
    idx = jnp.clip(bins[:, None] + offs[None, :], 0, n - 1)
    w = jnp.take_along_axis(probs, idx, axis=1)
    cents = bins_to_cents(idx.astype(jnp.float32))
    avg_cents = (w * cents).sum(1) / jnp.maximum(w.sum(1), 1e-9)
    f0 = cents_to_frequency(avg_cents)
    periodicity = jnp.take_along_axis(probs, bins[:, None], axis=1)[:, 0]
    return f0, periodicity


def median_filter(x: np.ndarray, win: int = 3):
    """torchcrepe filter.median parity: NaN-aware sliding median with NaN
    edge padding (missing values shrink the window)."""
    half = win // 2
    xp = np.concatenate([np.full(half, np.nan), np.asarray(x, np.float64),
                         np.full(half, np.nan)])
    sw = np.lib.stride_tricks.sliding_window_view(xp, win)
    with np.errstate(all="ignore"):
        return np.nanmedian(sw, axis=1)


def mean_filter(x: np.ndarray, win: int = 3):
    """torchcrepe filter.mean parity: NaN-aware windowed mean — NaNs count
    as missing (not as zeros), all-NaN windows stay NaN. Averaging zeros in
    place of NaNs would drag voiced f0 toward 0 at every voicing boundary."""
    half = win // 2
    xp = np.concatenate([np.full(half, np.nan), np.asarray(x, np.float64),
                         np.full(half, np.nan)])
    valid = ~np.isnan(xp)
    vals = np.where(valid, xp, 0.0)
    k = np.ones(win)
    ksum = np.convolve(vals, k, mode="valid")
    kcnt = np.convolve(valid.astype(np.float64), k, mode="valid")
    return np.where(kcnt > 0, ksum / np.maximum(kcnt, 1.0), np.nan)


def load_crepe(path: str) -> Dict:
    """Convert a torchcrepe 'full' state dict (conv1..conv6 + BN +
    classifier) to params."""
    if path in _model_cache:
        return _model_cache[path]
    from ..utils import convert_torch as cvt

    sd = cvt.torch_load(path)
    sd = {k: cvt._to_np(v) for k, v in sd.items()}
    layers = []
    for i in range(1, 7):
        w = sd[f"conv{i}.weight"]  # [out, in, k, 1]
        layers.append({
            "conv": {"w": w[:, :, :, 0].transpose(2, 1, 0).astype(np.float32),
                     "b": sd[f"conv{i}.bias"].astype(np.float32)},
            "bn": {"scale": sd[f"conv{i}_BN.weight"].astype(np.float32),
                   "bias": sd[f"conv{i}_BN.bias"].astype(np.float32),
                   "mean": sd[f"conv{i}_BN.running_mean"].astype(np.float32),
                   "var": sd[f"conv{i}_BN.running_var"].astype(np.float32)},
        })
    params = {"layers": layers,
              "classifier": cvt.linear(sd, "classifier")}
    _model_cache[path] = params
    return params


def get_pitch_crepe(wav: np.ndarray, mel: np.ndarray, hp, threshold=0.05,
                    params: Optional[Dict] = None):
    """Reference-chain crepe f0 on the mel grid (data_gen_utils.py:191-230)."""
    from ..utils.audio_io import resample

    if params is None:
        path = hp.get("crepe_path", "checkpoints/crepe/full.pth")
        if not os.path.exists(path):
            raise FileNotFoundError(f"no crepe weights at {path}")
        params = load_crepe(path)

    wav16k = resample(np.asarray(wav, np.float32), hp["audio_sample_rate"], SR)
    frames = frame_audio(wav16k)
    probs = np.asarray(forward(params, jnp.asarray(frames)))
    f0, pd = (np.asarray(a) for a in decode(jnp.asarray(probs)))

    # filtering chain
    pd = median_filter(pd, 3)
    # silence: A-weighted loudness below -60 dB (torchcrepe
    # threshold.Silence via loudness.a_weighted)
    pd[a_weighted_loudness(wav16k)[: len(pd)] < -60.0] = 0.0
    f0 = np.where(pd < threshold, np.nan, f0)
    # NaN-aware mean filter (win 3), then NaN (unvoiced) -> 0
    # (data_gen_utils.py:210-213)
    f0 = mean_filter(f0, 3)
    f0 = np.where(np.isnan(f0), 0.0, f0).astype(np.float32)

    # interp voiced f0 onto mel frame times (5 ms crepe grid -> hop grid)
    nz = np.nonzero(f0)[0]
    time_frame = np.arange(len(mel)) * hp["hop_size"] / hp["audio_sample_rate"]
    if len(nz) == 0:
        out = np.zeros(len(mel), np.float32)
        print("f0 all zero!")
    else:
        time_org = 0.005 * nz
        out = np.interp(time_frame, time_org, f0[nz],
                        left=f0[nz[0]], right=f0[nz[-1]]).astype(np.float32)
    coarse = f0_to_coarse(out, hp["f0_bin"], hp["f0_min"], hp["f0_max"])
    return out, coarse
