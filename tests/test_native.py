"""Native runtime: build (if toolchain present) and verify against the
scipy/numpy reference implementations."""

import shutil

import numpy as np
import pytest
from scipy.ndimage import maximum_filter1d, uniform_filter1d

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def native():
    from diffsvc_tpu.native import build, runtime

    if not runtime.available():
        build.build(verbose=False)
        runtime._TRIED = False  # re-probe after build
    assert runtime.available()
    return runtime


def test_window_maximum_matches_scipy(native):
    rng = np.random.RandomState(0)
    arr = rng.randn(10000).astype(np.float32)
    win = 301
    ref = maximum_filter1d(arr, size=win)[win // 2: win // 2 + len(arr) - win + 1]
    got = native.window_maximum(arr, win)
    np.testing.assert_allclose(got, ref)


def test_window_rms_matches_scipy(native):
    rng = np.random.RandomState(0)
    arr = (rng.randn(5000) * 0.3).astype(np.float32)
    win = 101
    f = np.sqrt(np.abs(uniform_filter1d(arr.astype(np.float64) ** 2, win)
                       - uniform_filter1d(arr.astype(np.float64), win) ** 2))
    ref = f[win // 2: win // 2 + len(arr) - win + 1]
    got = native.window_rms(arr, win)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_align_uniform_matches_python(native):
    from diffsvc_tpu.data.features import get_align_uniform

    for mel_len, n_units in [(10, 5), (100, 37), (1000, 250), (7, 7)]:
        ref = get_align_uniform(mel_len, n_units)
        got = native.align_uniform(mel_len, n_units)
        np.testing.assert_array_equal(got, ref)


def test_f0_to_coarse_matches_python(native):
    from diffsvc_tpu.ops.pitch import f0_to_coarse

    f0 = np.array([0.0, 50.0, 123.4, 220.0, 440.0, 880.0, 1100.0, 2000.0],
                  np.float32)
    ref = f0_to_coarse(f0)
    got = native.f0_to_coarse(f0, 256, 50.0, 1100.0)
    np.testing.assert_array_equal(got, ref)


def test_pcm16(native):
    pcm = np.array([-32768, 0, 16384, 32767], np.int16)
    out = native.pcm16_to_float(pcm)
    np.testing.assert_allclose(out, [-1.0, 0.0, 0.5, 32767 / 32768], rtol=1e-6)


def test_slicer_uses_native_when_available(native):
    """The slicer path must produce identical chunks with and without the
    native filters."""
    from diffsvc_tpu.infer import slicer as slicer_mod

    sr = 24000
    t = np.arange(sr * 12) / sr
    wav = 0.5 * np.sin(2 * np.pi * 220 * t).astype(np.float32)
    wav[6 * sr: 7 * sr] = 0.0
    s = slicer_mod.Slicer(sr=sr, db_threshold=-40)
    chunks_native = s.slice(wav)

    import unittest.mock as mock

    with mock.patch.object(native, "available", return_value=False):
        chunks_py = s.slice(wav)
    assert chunks_native == chunks_py
