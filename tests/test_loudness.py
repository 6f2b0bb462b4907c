"""BS.1770 loudness meter + reference-pipeline trim_long_silences.

The meter (diffsvc_tpu/ops/loudness.py) replaces the reference's
pyloudnorm dependency (reference data_gen_utils.py:41-46, :117-122).
Anchors: the ITU-R BS.1770-4 48 kHz filter tables, the spec's
0 dBFS ~1 kHz sine = -3.01 LUFS calibration point, gain linearity, and
the -70 LKFS absolute gate. trim_long_silences tests pin the reference's
pipeline arithmetic (data_gen_utils.py:30-93): 16 kHz / 30 ms windows,
width-8 moving average, ones(13) dilation (6 frames each side, not 12),
and the mask-resize-to-raw-length semantics.
"""

import numpy as np
import pytest

from diffsvc_tpu.ops.loudness import (
    integrated_loudness, k_weighting_coeffs, normalize_loudness)
from diffsvc_tpu.utils.audio_io import trim_long_silences


def _sine(dur, sr, f=997.0, amp=1.0):
    return (amp * np.sin(2 * np.pi * f * np.arange(int(dur * sr)) / sr)
            ).astype(np.float32)


def test_k_weighting_matches_bs1770_tables_at_48k():
    """The parametric design must reproduce the spec's tabulated 48 kHz
    coefficients (BS.1770-4 Tables 1-2) to float precision."""
    (sb, sa), (hb, ha) = k_weighting_coeffs(48000)
    np.testing.assert_allclose(
        sb, [1.53512485958697, -2.69169618940638, 1.19839281085285],
        atol=1e-10)
    np.testing.assert_allclose(
        sa, [1.0, -1.69065929318241, 0.73248077421585], atol=1e-10)
    np.testing.assert_allclose(hb, [1.0, -2.0, 1.0], atol=0)
    np.testing.assert_allclose(
        ha, [1.0, -1.99004745483398, 0.99007225036621], atol=1e-10)


@pytest.mark.parametrize("sr", [48000, 44100, 24000])
def test_full_scale_kilohertz_sine_reads_minus_3(sr):
    """Spec calibration point: a 0 dBFS ~1 kHz sine = -3.01 LUFS (the
    -0.691 offset cancels the K-filter's gain there), at ANY rate via
    the parametric filters."""
    loud = integrated_loudness(_sine(3.0, sr), sr)
    assert abs(loud - (-3.01)) < 0.06, loud


def test_gain_linearity():
    sr = 44100
    x = _sine(2.0, sr)
    l1 = integrated_loudness(x, sr)
    l2 = integrated_loudness(0.25 * x, sr)
    assert abs((l1 - l2) - 12.04) < 0.02


def test_absolute_gate_ignores_silence():
    """Appended digital silence falls under the -70 LKFS gate, so the
    integrated reading moves only by the tone->silence boundary blocks
    (<0.5 LU); ungated mean-square would read 10*log10(2/6) = 4.8 LU
    lower."""
    sr = 44100
    x = _sine(2.0, sr, amp=0.3)
    padded = np.concatenate([x, np.zeros(4 * sr, np.float32)])
    assert abs(integrated_loudness(padded, sr)
               - integrated_loudness(x, sr)) < 0.5


def test_unmeasurable_inputs():
    sr = 44100
    assert integrated_loudness(np.zeros(sr, np.float32), sr) == float("-inf")
    assert integrated_loudness(np.zeros(100, np.float32), sr) == float("-inf")
    # normalize leaves unmeasurable input unchanged
    short = np.ones(100, np.float32)
    np.testing.assert_array_equal(normalize_loudness(short, sr, -20.0), short)


def test_normalize_hits_target():
    sr = 48000
    x = _sine(2.0, sr, amp=0.05)
    y = normalize_loudness(x, sr, -20.0)
    assert abs(integrated_loudness(y, sr) - (-20.0)) < 0.05


# ---------------------------------------------------------------------------
# trim_long_silences reference-pipeline arithmetic
# ---------------------------------------------------------------------------

SR16 = 16000
SPW = 480  # 30 ms @ 16 kHz


def _frames_wav(flags, sr=SR16):
    """Build a 16 kHz wav whose 30 ms windows are voiced (0.5 amplitude
    noise-free tone) or silent per ``flags``."""
    out = np.zeros(len(flags) * SPW, np.float32)
    t = np.arange(SPW) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    for i, f in enumerate(flags):
        if f:
            out[i * SPW: (i + 1) * SPW] = tone
    return out


def test_dilation_is_six_frames_each_side():
    """Reference :87 dilates with ones(vad_max_silence_length + 1) — a
    CENTERED 13-tap element, i.e. 6 frames each side for the default 12
    (a 12-each-side dilation would keep twice the silence)."""
    flags = np.zeros(80, bool)
    flags[30:42] = True  # 12 voiced frames: survives MA(8) smoothing
    wav = _frames_wav(flags)
    _, mask = trim_long_silences(wav, SR16)
    fmask = mask[: 80 * SPW].reshape(80, SPW).any(axis=1)
    first, last = int(np.argmax(fmask)), 79 - int(np.argmax(fmask[::-1]))
    # smoothing rounds the island's edges in/out by <= 2 frames; the
    # dilation then adds exactly 6 per side. 12 per side would put
    # first <= 30 - 12 = 18.
    assert 30 - 8 <= first <= 30 - 4, (first, last)
    assert 42 + 3 <= last <= 42 + 7, (first, last)


def test_short_gap_fully_kept_long_gap_trimmed():
    """A gap <= 12 frames is bridged by the two sides' 6-frame dilations;
    a long gap is trimmed down to its dilated borders."""
    flags = np.zeros(120, bool)
    flags[10:22] = True
    flags[32:44] = True          # 10-frame gap: bridged
    flags[84:96] = True          # 40-frame gap before this: trimmed
    wav = _frames_wav(flags)
    _, mask = trim_long_silences(wav, SR16)
    fmask = mask[: 120 * SPW].reshape(120, SPW).any(axis=1)
    assert fmask[22:32].all()            # short gap survives whole
    gap = fmask[44:84]
    assert (~gap[10:30]).all()           # middle of the long gap is cut
    assert gap[:8].any() and gap[-8:].any()   # dilated borders remain


def test_mask_resizes_to_raw_length_at_other_rates():
    """Reference :88-93 computes the mask at 16 kHz and resizes it onto
    the ORIGINAL-rate waveform; the mask must cover the full raw length
    even though 16 kHz framing dropped a remainder."""
    sr = 44100
    wav = np.concatenate([np.zeros(2 * sr), 0.4 * np.ones(sr),
                          np.zeros(2 * sr), np.zeros(317)]).astype(np.float32)
    trimmed, mask = trim_long_silences(wav, sr)
    assert len(mask) == len(wav)
    assert mask[2 * sr: 3 * sr].all()    # the voiced second survives
    assert len(trimmed) < len(wav)


def test_norm_path_hits_minus_20_lufs():
    sr = 24000
    wav = np.concatenate([_sine(1.0, sr, amp=0.02),
                          np.zeros(3 * sr, np.float32)])
    trimmed, _ = trim_long_silences(wav, sr, norm=True)
    # the whole (tone + silence) signal was normalized to -20 LUFS;
    # measuring the surviving tone second alone reads within the
    # silence-boundary gating shift of that target
    assert abs(integrated_loudness(trimmed[: sr], sr) - (-20.0)) < 1.0


def test_vad_fn_is_pluggable_and_sees_int16_windows():
    seen = []

    def vad(window):
        seen.append((window.dtype, len(window)))
        return True

    wav = np.zeros(SR16, np.float32)
    _, mask = trim_long_silences(wav, SR16, vad_fn=vad)
    assert all(d == np.int16 and n == SPW for d, n in seen)
    assert len(seen) == SR16 // SPW  # 33 full windows, remainder dropped
    assert mask.all()
