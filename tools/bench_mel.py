"""Mel DFT precision/support A-B on TPU: time + accuracy vs fp64 host.

Measures wav2mel_nsf (44.1k production profile) at dft_precision
highest (6-pass) / high (3-pass) / default (1-pass bf16), with the
filterbank-support bin restriction now always on, and reports max-abs
log-mel error vs a float64 numpy reference.

Usage: python tools/bench_mel.py [--secs 10] [--runs 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def host_mel_f64(wav, sr, n_fft, hop, win, n_mels, fmin, fmax, clip=1e-5):
    import numpy as np

    from diffsvc_tpu.ops import mel as M

    pad = (n_fft - hop) // 2
    y = np.pad(np.asarray(wav, np.float64), (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    hw = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    frames = y[idx] * hw
    spec = np.fft.rfft(frames, axis=-1)
    mag = np.sqrt(spec.real**2 + spec.imag**2 + 1e-9)
    basis = M.mel_filterbank(sr, n_fft, n_mels, fmin, fmax).astype(np.float64)
    mel = mag @ basis.T
    return np.log(np.clip(mel, clip, None)) * M.LOG10_E


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    import jax
    import numpy as np

    from diffsvc_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax.numpy as jnp

    from diffsvc_tpu.ops import mel as M

    log(f"| device: {jax.devices()[0]}")
    SR, NFFT, HOP, NMEL = 44100, 2048, 512, 128
    rng = np.random.RandomState(0)
    t = np.arange(int(SR * args.secs)) / SR
    ph = np.cumsum(2 * np.pi * 220 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t)) / SR)
    wav = (0.4 * np.sin(ph) + 0.2 * np.sin(2 * ph)
           + 0.01 * rng.randn(len(t))).astype(np.float32)

    ref = host_mel_f64(wav, SR, NFFT, HOP, NFFT, NMEL, 40.0, 16000.0)
    wj = jnp.asarray(wav)
    out = {}
    for prec in ["highest", "high", "default"]:
        f = lambda w: M.wav2mel_nsf(w, sr=SR, n_fft=NFFT, hop=HOP,
                                    win_length=NFFT, n_mels=NMEL, fmin=40.0,
                                    fmax=16000.0, dft_precision=prec)
        mel = f(wj)
        np.asarray(mel[-1, :4])
        err = float(np.max(np.abs(np.asarray(mel) - ref)))
        ts = []
        for i in range(args.runs):
            t0 = time.time()
            for _ in range(8):
                mel = f(wj)
            np.asarray(mel[-1, :4])
            ts.append((time.time() - t0) / 8)
        best = min(ts)
        out[prec] = {"ms": round(best * 1e3, 2), "max_abs_logmel_err": err}
        log(f"| {prec}: {best*1e3:.2f} ms, max abs log10-mel err {err:.2e}")
    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()
