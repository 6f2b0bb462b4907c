"""AC-tracker golden fixtures (VERDICT r1 'Next #6').

parselmouth/Praat is not installed in any reachable environment, so the
external golden is ANALYTIC ground truth instead: a small corpus of
synthetic singing/speech clips whose f0(t) and voicing are known exactly
(vibrato, glides, octave-trap harmonics, silence gaps, additive noise).

Two layers of protection for ops/f0_ac.py:
1. accuracy vs ground truth — voiced-frame agreement >= 95% and median
   cent error <= 20 within voiced regions (the BASELINE targets for f0);
2. regression goldens — the current tracker's full output tracks are
   committed as tests/goldens/*.npy; any future change to candidate costs,
   Viterbi transitions, or uv boundaries that moves a track fails loudly.
   Regenerate deliberately with: GOLDEN_WRITE=1 pytest tests/test_f0_goldens.py

Reference behavior replaced: get_pitch_parselmouth
(preprocessing/data_gen_utils.py:152-188).
"""

import os

import numpy as np
import pytest

from diffsvc_tpu.config import HParams

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _phase(f0_curve, sr):
    return np.cumsum(2 * np.pi * f0_curve / sr)


def _corpus():
    """[(name, hp, wav, f0_true, uv_true_fn)] — f0_true per mel frame."""
    out = []

    # (a) 24 kHz vibrato with a silence gap (uv boundary stress)
    sr, hop = 24000, 128
    t = np.arange(int(sr * 1.6)) / sr
    f0c = 220.0 * 2 ** (0.05 * np.sin(2 * np.pi * 5.0 * t))
    wav = (0.4 * np.sin(_phase(f0c, sr)) + 0.2 * np.sin(2 * _phase(f0c, sr))
           + 0.1 * np.sin(3 * _phase(f0c, sr)))
    gap = slice(int(0.7 * sr), int(0.9 * sr))
    wav[gap] = 0.0
    voiced = np.ones(len(t), bool)
    voiced[gap] = False
    out.append(("vibrato_gap_24k", HParams(
        audio_sample_rate=sr, hop_size=hop, f0_min=50.0, f0_max=1100.0,
        f0_bin=256), wav.astype(np.float32), f0c, voiced))

    # (b) 24 kHz rising glide with breath noise (SNR ~ 20 dB)
    rng = np.random.RandomState(1)
    t = np.arange(int(sr * 1.2)) / sr
    f0c = 180.0 * (320.0 / 180.0) ** (t / t[-1])
    wav = (0.35 * np.sin(_phase(f0c, sr)) + 0.2 * np.sin(2 * _phase(f0c, sr))
           + 0.12 * np.sin(3 * _phase(f0c, sr)) + 0.03 * rng.randn(len(t)))
    out.append(("glide_noise_24k", HParams(
        audio_sample_rate=sr, hop_size=hop, f0_min=50.0, f0_max=1100.0,
        f0_bin=256), wav.astype(np.float32), f0c,
        np.ones(len(t), bool)))

    # (c) 44.1 kHz low voice with a dominant 2nd harmonic (octave trap)
    sr, hop = 44100, 512
    t = np.arange(int(sr * 1.2)) / sr
    f0c = 110.0 * (1 + 0.02 * np.sin(2 * np.pi * 4.0 * t))
    wav = (0.2 * np.sin(_phase(f0c, sr)) + 0.4 * np.sin(2 * _phase(f0c, sr))
           + 0.15 * np.sin(3 * _phase(f0c, sr)))
    out.append(("octave_trap_44k", HParams(
        audio_sample_rate=sr, hop_size=hop, f0_min=40.0, f0_max=1100.0,
        f0_bin=256), wav.astype(np.float32), f0c,
        np.ones(len(t), bool)))
    return out


def _frame_truth(hp, wav_len, f0_samplewise, voiced_samplewise):
    sr, hop = hp["audio_sample_rate"], hp["hop_size"]
    mel_len = wav_len // hop + 1
    idx = np.minimum(np.arange(mel_len) * hop, wav_len - 1)
    return mel_len, f0_samplewise[idx], voiced_samplewise[idx]


@pytest.mark.parametrize("case", _corpus(), ids=lambda c: c[0])
def test_ac_tracker_accuracy_vs_analytic_truth(case):
    from diffsvc_tpu.ops.f0_ac import get_pitch_ac

    name, hp, wav, f0_true_s, uv_s = case
    mel_len, f0_true, voiced_true = _frame_truth(hp, len(wav), f0_true_s, uv_s)
    f0, _ = get_pitch_ac(wav, mel_len, hp)
    assert len(f0) == mel_len

    # uv boundaries are ambiguous within the analysis window: ignore frames
    # within 3 hops of a voicing transition
    trans = np.flatnonzero(np.diff(voiced_true.astype(np.int8)) != 0)
    ambiguous = np.zeros(mel_len, bool)
    for tr in trans:
        ambiguous[max(0, tr - 3): tr + 4] = True
    # edge frames: window not fully inside the signal
    ambiguous[:2] = ambiguous[-2:] = True

    clear = ~ambiguous
    agree = ((f0 > 0) == voiced_true)[clear].mean()
    assert agree >= 0.95, (name, agree)

    both = clear & voiced_true & (f0 > 0)
    cents = 1200 * np.abs(np.log2(f0[both] / f0_true[both]))
    assert np.median(cents) <= 20.0, (name, float(np.median(cents)))
    # no octave errors in clearly voiced regions
    assert (cents > 600).mean() < 0.01, (name, float((cents > 600).mean()))


@pytest.mark.parametrize("case", _corpus(), ids=lambda c: c[0])
def test_ac_tracker_matches_committed_golden(case):
    """Regression gate: the committed golden track pins candidate costs,
    Viterbi tie-breaks, and uv boundaries bit-for-bit-ish (tiny float slack
    for BLAS/FFT reordering across platforms)."""
    from diffsvc_tpu.ops.f0_ac import get_pitch_ac

    name, hp, wav, _f0s, _uvs = case
    mel_len = len(wav) // hp["hop_size"] + 1
    f0, coarse = get_pitch_ac(wav, mel_len, hp)
    path = os.path.join(GOLDEN_DIR, f"f0_ac_{name}.npy")

    if os.environ.get("GOLDEN_WRITE"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, np.stack([f0.astype(np.float64),
                                coarse.astype(np.float64)]))
        pytest.skip(f"golden (re)written: {path}")

    assert os.path.exists(path), f"missing golden {path} (GOLDEN_WRITE=1)"
    g = np.load(path)
    g_f0, g_coarse = g[0], g[1]
    # voicing decisions must match exactly
    uv_mismatch = ((f0 > 0) != (g_f0 > 0)).mean()
    assert uv_mismatch == 0.0, (name, uv_mismatch)
    voiced = g_f0 > 0
    np.testing.assert_allclose(f0[voiced], g_f0[voiced], rtol=1e-4,
                               err_msg=name)
    np.testing.assert_array_equal(coarse, g_coarse, err_msg=name)
