"""Host-side audio I/O: WAV read/write, mono mixdown, resampling.

The reference leans on librosa/soundfile/pydub; this framework is
self-contained: scipy.io.wavfile for container I/O and a polyphase resampler
(scipy.signal.resample_poly) for rate conversion. Formats beyond WAV are
gated with a clear error (reference ``infer_tools/infer_tool.py:70-74``
shells out to pydub for the same purpose).
"""

from __future__ import annotations

import io
import os
from typing import Optional, Tuple, Union

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly

int16_max = (2**15) - 1


def resample(wav: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample (kaiser-windowed FIR), float32 output."""
    if orig_sr == target_sr:
        return wav.astype(np.float32)
    g = np.gcd(int(orig_sr), int(target_sr))
    out = resample_poly(wav.astype(np.float64), target_sr // g, orig_sr // g)
    return out.astype(np.float32)


def load_wav(path: Union[str, io.BytesIO], sr: Optional[int] = None,
             mono: bool = True) -> Tuple[np.ndarray, int]:
    """Load a WAV file as float32 in [-1, 1]; optionally resample/mixdown.

    Mirrors librosa.load semantics used throughout the reference.
    """
    if isinstance(path, (str, os.PathLike)):
        ext = os.path.splitext(str(path))[-1].lower()
        if ext not in (".wav", ""):
            raise ValueError(
                f"Only WAV input is supported in this build (got {ext}); "
                "convert with ffmpeg first.")
    in_sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        from ..native import runtime as native

        if native.available():
            data = native.pcm16_to_float(data.ravel()).reshape(data.shape)
        else:
            data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if mono and data.ndim > 1:
        data = data.mean(-1)
    if sr is not None and sr != in_sr:
        data = resample(data, in_sr, sr)
        in_sr = sr
    return data, in_sr


def load_wav_nsf(path: Union[str, io.BytesIO], target_sr: Optional[int] = None
                 ) -> Tuple[np.ndarray, int]:
    """NSF-style loader: first channel (not mixdown) + max-magnitude
    normalization (reference ``modules/nsf_hifigan/nvSTFT.py:14-44``)."""
    in_sr, data = wavfile.read(path)
    if data.ndim > 1:
        data = data[:, 0]
    if np.issubdtype(data.dtype, np.integer):
        max_mag = float(-np.iinfo(data.dtype).min)
    else:
        max_mag = float(max(np.amax(data), -np.amin(data), 0.0))
        max_mag = (2**31) + 1 if max_mag > (2**15) else ((2**15) + 1 if max_mag > 1.01 else 1.0)
    data = data.astype(np.float32) / max_mag
    if target_sr is not None and in_sr != target_sr:
        data = resample(data, in_sr, target_sr)
        in_sr = target_sr
    return data, in_sr


def save_wav(wav: np.ndarray, path: str, sr: int, norm: bool = False) -> None:
    """int16 WAV writer (reference ``utils/audio.py:12-17``)."""
    wav = np.asarray(wav, dtype=np.float32)
    if norm and np.abs(wav).max() > 0:
        wav = wav / np.abs(wav).max()
    wavfile.write(path, sr, (np.clip(wav, -1.0, 1.0) * 32767).astype(np.int16))


def format_wav(in_path: str, out_path: Optional[str] = None) -> str:
    """Ensure a .wav sibling exists for the given audio path."""
    if in_path.lower().endswith(".wav"):
        return in_path
    out_path = out_path or os.path.splitext(in_path)[0] + ".wav"
    if os.path.exists(out_path):
        return out_path
    raise ValueError(
        f"Non-WAV input {in_path}: convert to WAV first (ffmpeg -i in out.wav)")


def trim_long_silences(wav: np.ndarray, sr: int,
                       vad_window_ms: int = 30,
                       moving_average_width: int = 8,
                       max_silence_length: int = 12,
                       db_threshold: float = -40.0):
    """Energy-based VAD silence trimming (the reference's optional
    ``trim_long_sil`` path used webrtcvad; this is the in-repo equivalent:
    framewise dB gate + moving-average smoothing + dilation).

    Returns (trimmed_wav, mask)."""
    spw = int(sr * vad_window_ms / 1000)
    n = len(wav) - (len(wav) % spw)
    frames = wav[:n].reshape(-1, spw)
    rms = np.sqrt((frames**2).mean(axis=1))
    voiced = 20 * np.log10(np.maximum(rms, 1e-10)) > db_threshold

    # moving-average smoothing
    w = moving_average_width
    padded = np.concatenate([np.zeros((w - 1) // 2), voiced.astype(float),
                             np.zeros(w // 2)])
    c = np.cumsum(padded)
    smooth = (c[w:] - c[:-w]) if len(c) > w else voiced.astype(float)
    smooth = np.round(np.concatenate([[voiced[0]], smooth / w])[: len(voiced)])

    # dilate voiced regions
    mask = smooth.astype(bool)
    for _ in range(max_silence_length):
        mask = mask | np.roll(mask, 1) | np.roll(mask, -1)
    sample_mask = np.repeat(mask, spw)
    sample_mask = np.concatenate(
        [sample_mask, np.ones(len(wav) - len(sample_mask), bool)])
    return wav[sample_mask], sample_mask
