import numpy as np
import pytest

from diffsvc_tpu.config import HParams
from diffsvc_tpu.ops.pitch import (denorm_f0, energy_to_coarse, f0_to_coarse,
                                   norm_f0, norm_interp_f0_np)


def _ref_f0_to_coarse(f0, f0_bin=256, f0_min=50.0, f0_max=1100.0):
    """Independent numpy transcription of the reference formula
    (utils/pitch_utils.py:17-31)."""
    f0 = np.asarray(f0, dtype=np.float64)
    f0_mel_min = 1127 * np.log(1 + f0_min / 700)
    f0_mel_max = 1127 * np.log(1 + f0_max / 700)
    f0_mel = 1127 * np.log(1 + f0 / 700)
    pos = f0_mel > 0
    f0_mel[pos] = (f0_mel[pos] - f0_mel_min) * (f0_bin - 2) / (f0_mel_max - f0_mel_min) + 1
    f0_mel[f0_mel <= 1] = 1
    f0_mel[f0_mel > f0_bin - 1] = f0_bin - 1
    return np.rint(f0_mel).astype(int)


def test_f0_to_coarse_matches_reference_formula():
    f0 = np.array([0.0, 50.0, 100.0, 220.0, 440.0, 880.0, 1100.0, 2000.0])
    got = f0_to_coarse(f0)
    expect = _ref_f0_to_coarse(f0)
    np.testing.assert_array_equal(got, expect)
    assert got.min() >= 1 and got.max() <= 255
    assert got[0] == 1  # unvoiced -> bin 1
    assert got[-1] == 255  # above ceiling clamps


def test_norm_denorm_roundtrip():
    f0 = np.array([100.0, 220.0, 440.0])
    n = norm_f0(f0.copy())
    np.testing.assert_allclose(n, np.log2(f0))
    d = denorm_f0(n.copy())
    np.testing.assert_allclose(d, f0, rtol=1e-6)


def test_norm_interp_f0():
    f0 = np.array([0.0, 220.0, 0.0, 0.0, 440.0, 0.0])
    fn, uv = norm_interp_f0_np(f0)
    np.testing.assert_array_equal(uv, [1, 0, 1, 1, 0, 1])
    # voiced values are log2
    np.testing.assert_allclose(fn[1], np.log2(220.0), rtol=1e-6)
    np.testing.assert_allclose(fn[4], np.log2(440.0), rtol=1e-6)
    # interpolated: between log2(220) and log2(440)
    assert fn[1] < fn[2] < fn[3] < fn[4]
    # edges extend
    np.testing.assert_allclose(fn[0], fn[1], rtol=1e-6)
    np.testing.assert_allclose(fn[5], fn[4], rtol=1e-6)


def test_norm_interp_all_unvoiced():
    fn, uv = norm_interp_f0_np(np.zeros(8))
    assert (fn == 0).all() and (uv == 1).all()


def test_denorm_f0_uv_and_padding():
    f0 = np.log2(np.array([220.0, 220.0, 220.0, 220.0]))
    uv = np.array([0.0, 1.0, 0.0, 0.0])
    pad = np.array([False, False, False, True])
    d = denorm_f0(f0, uv, use_uv=True, pitch_padding=pad)
    np.testing.assert_allclose(d, [220.0, 0.0, 220.0, 0.0], rtol=1e-5)


def test_energy_to_coarse():
    e = np.array([0.0, 0.016, 1.0, 5.0])
    got = energy_to_coarse(e)
    np.testing.assert_array_equal(got, [0, 1, 64, 255])


@pytest.mark.parametrize("freq", [110.0, 220.0, 523.25])
def test_ac_pitch_tracker_tone(freq):
    from diffsvc_tpu.ops.f0_ac import get_pitch_ac

    hp = HParams(audio_sample_rate=24000, hop_size=128, f0_min=50.0,
                 f0_max=1100.0, f0_bin=256)
    sr = 24000
    t = np.arange(sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * freq * t)
           + 0.2 * np.sin(2 * np.pi * 2 * freq * t)).astype(np.float32)
    mel_len = len(wav) // 128 + 1
    f0, coarse = get_pitch_ac(wav, mel_len, hp)
    assert len(f0) == mel_len and len(coarse) == mel_len
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.8 * mel_len
    med = np.median(voiced)
    assert abs(med - freq) / freq < 0.01, (med, freq)


def test_ac_pitch_silence_is_unvoiced():
    from diffsvc_tpu.ops.f0_ac import get_pitch_ac

    hp = HParams(audio_sample_rate=24000, hop_size=128, f0_min=50.0,
                 f0_max=1100.0, f0_bin=256)
    sr = 24000
    t = np.arange(sr) / sr
    wav = 0.5 * np.sin(2 * np.pi * 220 * t).astype(np.float32)
    wav[sr // 2:] = 0.0
    mel_len = len(wav) // 128 + 1
    f0, _ = get_pitch_ac(wav.astype(np.float32), mel_len, hp)
    tail = f0[int(0.6 * sr / 128):]
    assert (tail == 0).mean() > 0.95


def test_ac_pitch_noisy_singing_octave_stability():
    """Vibrato + harmonics + noise: the tracker must stay on the fundamental
    (no octave jumps) and keep a coherent voiced region."""
    from diffsvc_tpu.ops.f0_ac import get_pitch_ac

    hp = HParams(audio_sample_rate=24000, hop_size=128, f0_min=50.0,
                 f0_max=1100.0, f0_bin=256)
    sr = 24000
    rng = np.random.RandomState(0)
    t = np.arange(sr * 2) / sr
    f0_curve = 260.0 * (1 + 0.04 * np.sin(2 * np.pi * 5.5 * t))
    phase = np.cumsum(2 * np.pi * f0_curve / sr)
    wav = (0.4 * np.sin(phase) + 0.25 * np.sin(2 * phase)
           + 0.15 * np.sin(3 * phase) + 0.08 * np.sin(4 * phase)
           + 0.02 * rng.randn(len(t))).astype(np.float32)
    mel_len = len(wav) // 128 + 1
    f0, _ = get_pitch_ac(wav, mel_len, hp)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.9 * mel_len
    # median on the fundamental, not an octave error
    med = np.median(voiced)
    assert abs(med - 260.0) / 260.0 < 0.02, med
    # no octave jumps: all voiced frames within +-40% of the median
    frac_outliers = float(((voiced < 0.6 * med) | (voiced > 1.6 * med)).mean())
    assert frac_outliers < 0.02, frac_outliers


def test_ac_viterbi_backtrack_alignment():
    """The decoded path must include frame 0's own decision (a brute-force
    max-product decode over a tiny candidate lattice is the oracle)."""
    import itertools

    import jax.numpy as jnp

    from diffsvc_tpu.ops.f0_ac import (_viterbi, OCTAVE_JUMP_COST,
                                       VOICED_UNVOICED_COST)

    rng = np.random.RandomState(3)
    n_frames, n_cand = 5, 3
    # candidate 0 = unvoiced (freq 0), others voiced with random freqs
    freq = np.zeros((n_frames, n_cand), np.float32)
    freq[:, 1:] = rng.uniform(100, 400, (n_frames, n_cand - 1))
    strength = rng.uniform(0.1, 1.0, (n_frames, n_cand)).astype(np.float32)
    tsc = 1.0

    def cost(fp, fc):
        vp, vc = fp > 0, fc > 0
        if vp and vc:
            return OCTAVE_JUMP_COST * tsc * abs(np.log2(max(fp, 1e-6) / max(fc, 1e-6)))
        return 0.0 if vp == vc else VOICED_UNVOICED_COST * tsc

    best_path, best_score = None, -np.inf
    for path in itertools.product(range(n_cand), repeat=n_frames):
        s = strength[0, path[0]]
        for i in range(1, n_frames):
            s += strength[i, path[i]] - cost(freq[i - 1, path[i - 1]],
                                             freq[i, path[i]])
        if s > best_score:
            best_score, best_path = s, path

    got = np.asarray(_viterbi(jnp.asarray(freq), jnp.asarray(strength), tsc))
    np.testing.assert_array_equal(got, np.asarray(best_path))


def test_ac_viterbi_parallel_matches_sequential_scan():
    """The production associative-scan Viterbi (max-plus prefix products +
    composed backpointer maps) must decode the same path as the sequential
    lax.scan DP on realistic-size lattices, including the length-1 and
    length-2 edges."""
    import jax.numpy as jnp

    from diffsvc_tpu.ops.f0_ac import _viterbi, _viterbi_scan

    rng = np.random.RandomState(11)
    for T in (1, 2, 3, 64, 860):
        freq = np.where(rng.rand(T, 15) < 0.3, 0.0,
                        rng.uniform(60, 900, (T, 15))).astype(np.float32)
        freq[:, 0] = 0.0
        strength = rng.randn(T, 15).astype(np.float32)
        par = np.asarray(_viterbi(jnp.asarray(freq), jnp.asarray(strength),
                                  0.86))
        if T == 1:
            np.testing.assert_array_equal(par, [int(np.argmax(strength[0]))])
            continue
        seq = np.asarray(_viterbi_scan(jnp.asarray(freq),
                                       jnp.asarray(strength), 0.86))
        np.testing.assert_array_equal(par, seq)
