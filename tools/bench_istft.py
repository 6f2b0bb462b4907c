"""iSTFT-head vocoder timing on TPU vs the NSF-HiFiGAN numbers.

Production 44.1 kHz profile (128 mel, hop 512, n_fft 2048), dim 512 x 8
layers, ~10 s of audio. Compare with tools/bench_voc.py (NSF packed fp32
~19.5 ms, pallas tail ~20.7 ms): the iSTFT head spends ~20x fewer FLOPs
and spends them in wide multi-MXU matmuls, so it should land in the
low-single-digit milliseconds.

Usage: python tools/bench_istft.py [--secs 10] [--runs 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffsvc_tpu.utils.compile_cache import enable as _cc
    _cc()
    from diffsvc_tpu.vocoders import istft_head as ih

    log(f"| device: {jax.devices()[0]}")
    SR, HOP, NMEL = 44100, 512, 128
    T = int(args.secs * SR) // HOP
    cfg = ih.IstftVocoderConfig(num_mels=NMEL, dim=512, n_layers=8,
                                n_fft=2048, hop=HOP, sampling_rate=SR,
                                use_f0=True)
    params = ih.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(1, T, NMEL) * 2 - 5, jnp.float32)
    f0 = jnp.asarray(np.abs(rng.randn(1, T)) * 80 + 180, jnp.float32)

    out = {}
    for name, dt in [("fp32", None), ("bf16", jnp.bfloat16)]:
        f = jax.jit(lambda p, m, f0v: ih.apply(p, cfg, m, f0v, dtype=dt))
        y = f(params, mel, f0)
        np.asarray(y[0, -4:])
        ts = []
        for i in range(args.runs):
            t0 = time.time()
            for _ in range(8):
                y = f(params, mel, f0)
            np.asarray(y[0, -4:])
            ts.append((time.time() - t0) / 8)
        best = min(ts)
        out[f"istft_{name}_ms"] = round(best * 1e3, 2)
        log(f"| istft vocoder {name}: {best*1e3:.2f} ms/call "
            "(runs: " + " ".join(f"{t*1e3:.1f}" for t in ts) + ")")
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    log(f"| params: {n_params/1e6:.1f} M")
    out["params_m"] = round(n_params / 1e6, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
