"""mel-MCD / waveform comparison harness (the BASELINE.md parity metric).

Compares two mel spectrograms (.npy, [T, M] log10 domain) or two wavs:

    python tools/compare_mel.py ref_mel.npy ours_mel.npy
    python tools/compare_mel.py ref.wav ours.wav --config configs/config_44k.yaml

MCD here is the standard mel-cepstral distortion over DCT coefficients of
the log-mel (10*sqrt(2)/ln(10) * ||c1-c2||), reported in dB, plus plain
log-mel L1/L2 and f0 RMSE when wavs are given.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
from scipy.fftpack import dct


def align_lengths(a: np.ndarray, b: np.ndarray):
    n = min(len(a), len(b))
    return a[:n], b[:n]


def mel_mcd(mel1: np.ndarray, mel2: np.ndarray, n_coeffs: int = 13) -> float:
    """MCD (dB) between two log10-mel spectrograms [T, M]."""
    mel1, mel2 = align_lengths(mel1, mel2)
    # log10 -> ln for the cepstral convention
    c1 = dct(mel1 * np.log(10.0), type=2, axis=1, norm="ortho")[:, 1:n_coeffs]
    c2 = dct(mel2 * np.log(10.0), type=2, axis=1, norm="ortho")[:, 1:n_coeffs]
    k = 10.0 * np.sqrt(2.0) / np.log(10.0)
    return float(k * np.sqrt(((c1 - c2) ** 2).sum(axis=1)).mean())


def compare_mels(mel1, mel2):
    mel1, mel2 = align_lengths(np.asarray(mel1), np.asarray(mel2))
    return {
        "mcd_db": mel_mcd(mel1, mel2),
        "l1": float(np.abs(mel1 - mel2).mean()),
        "rmse": float(np.sqrt(((mel1 - mel2) ** 2).mean())),
        "frames": int(len(mel1)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref")
    ap.add_argument("ours")
    ap.add_argument("--config", default=None)
    args = ap.parse_args()

    if args.ref.endswith(".npy"):
        mel1, mel2 = np.load(args.ref), np.load(args.ours)
    else:
        from diffsvc_tpu.config.hparams import set_hparams
        from diffsvc_tpu.ops.mel import wav2spec
        from diffsvc_tpu.utils.audio_io import load_wav

        assert args.config, "--config required for wav inputs"
        hp = set_hparams(args.config, exp_name="", print_hparams=False,
                         reset=True, global_hparams=False)
        w1, _ = load_wav(args.ref, sr=hp["audio_sample_rate"])
        w2, _ = load_wav(args.ours, sr=hp["audio_sample_rate"])
        _, mel1 = wav2spec(w1, hp)
        _, mel2 = wav2spec(w2, hp)

    stats = compare_mels(mel1, mel2)
    for k, v in stats.items():
        print(f"{k}: {v}")
    # BASELINE.md target: mel-MCD < 0.5 dB vs reference
    sys.exit(0 if stats["mcd_db"] < 0.5 else 1)


if __name__ == "__main__":
    main()
