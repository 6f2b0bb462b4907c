"""Amortized per-component TPU timing of the serving pipeline.

The tunneled bench device costs ~30 ms per dispatch round-trip, so
single-dispatch stage timings (bench.py's modular path) overstate small
stages.  Here each component is timed over K async dispatches with ONE
final 4-float fetch, so the dispatch floor amortizes to ~30/K ms and the
numbers approximate each component's share *inside* the fused graph.

Components, at production dims on 10 s of 44.1 kHz audio:
  mel (wav2mel_nsf) | AC f0 tracker | in-graph 44.1k->16k resample |
  HuBERT-soft units | diffusion sampling loop (fp32 / bf16) |
  vocoder: see tools/bench_voc.py.

Usage: python tools/bench_pipe_stages.py [--secs 10] [--runs 3] [--k 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (smoke test; the axon plugin ignores "
                         "JAX_PLATFORMS alone)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from diffsvc_tpu.utils.compile_cache import enable as _cc
    _cc()
    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.models import hubert as hubert_model
    from diffsvc_tpu.models.diffusion import GaussianDiffusion
    from diffsvc_tpu.ops import mel as mel_ops
    from diffsvc_tpu.ops import f0_ac
    from diffsvc_tpu.ops.resample import resample_length, resample_poly_device

    log(f"| device: {jax.devices()[0]}")
    SR, SECS = 44100, args.secs
    HOP, NFFT, NMEL = 512, 2048, 128
    SPEEDUP = 20
    hp = HParams(
        audio_sample_rate=SR, audio_num_mel_bins=NMEL, fft_size=NFFT,
        hop_size=HOP, win_size=NFFT, fmin=40, fmax=16000,
        hidden_size=256, residual_layers=20, residual_channels=384,
        dilation_cycle_length=4, timesteps=1000, K_step=1000,
        diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=NMEL, spec_min=[-5.0], spec_max=[0.0], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=False, use_spk_id=False,
        use_spk_embed=False, use_uv=False, pitch_norm="log", f0_bin=256,
        f0_min=40.0, f0_max=1100.0, pndm_speedup=SPEEDUP,
    )

    n44 = int(SR * SECS)
    rng = np.random.RandomState(0)
    t = np.arange(n44) / SR
    wav = (0.35 * np.sin(2 * np.pi * 220 * t)
           + 0.1 * rng.randn(n44) * 0.01).astype(np.float32)
    wav_d = jnp.asarray(wav)

    K = args.k

    def timeit(name, fn, *xs):
        f = jax.jit(fn)

        def sync(o):
            np.asarray(jax.tree.leaves(o)[0].ravel()[:4])

        sync(f(*xs))
        ts = []
        for _ in range(args.runs):
            t0 = time.time()
            for _ in range(K):
                o = f(*xs)
            sync(o)
            ts.append((time.time() - t0) / K)
        log(f"| {name:44s} {min(ts)*1e3:7.1f} ms/call (K={K} async)")
        return min(ts)

    # dispatch floor: a no-op graph
    timeit("no-op (dispatch floor)", lambda x: x + 1.0,
           jnp.zeros((8,), jnp.float32))

    timeit("mel wav2mel_nsf",
           lambda w: mel_ops.wav2mel_nsf(w, sr=SR, n_fft=NFFT, hop=HOP,
                                         win_length=NFFT, n_mels=NMEL,
                                         fmin=40.0, fmax=16000.0), wav_d)

    T = n44 // HOP + 1
    window_len_s = f0_ac.PERIODS_PER_WINDOW / float(hp["f0_min"])
    win_samples = int(round(window_len_s * SR))
    n_fr, t1 = f0_ac._praat_frame_grid(n44, SR, HOP / SR, window_len_s)
    start0 = int(round((t1 - window_len_s / 2) * SR))
    fft_size = int(2 ** np.ceil(np.log2(2 * win_samples)))
    timeit("f0 AC tracker (device core)",
           lambda w: f0_ac._track(
               w, sr=SR, hop=HOP, n_frames=n_fr, win_samples=win_samples,
               fft_size=fft_size, start0=start0, f0_min=40.0, f0_max=1100.0,
               voicing_threshold=0.6, tsc=0.01 / (HOP / SR)), wav_d)

    n16 = resample_length(n44, SR, 16000)
    timeit("resample 44.1k->16k (in-graph polyphase)",
           lambda w: resample_poly_device(w, SR, 16000), wav_d)

    hub_cfg = hubert_model.HubertConfig()
    hub_params = hubert_model.init(jax.random.PRNGKey(1), hub_cfg)
    w16 = jnp.asarray(rng.randn(1, n16) * 0.1, jnp.float32)
    timeit("hubert units fp32",
           lambda p, w: hubert_model.units(p, hub_cfg, w), hub_params, w16)
    hub_bf = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, hub_params)
    timeit("hubert units bf16",
           lambda p, w: hubert_model.units(p, hub_cfg, w.astype(jnp.bfloat16)),
           hub_bf, w16)

    model = GaussianDiffusion(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    pad_T = -(-T // 128) * 128
    units = jnp.asarray(rng.randn(1, n16 // 320 - 1, 256) * 0.1, jnp.float32)
    batch = {
        "hubert": units,
        "mel2ph": jnp.asarray(
            np.linspace(1, units.shape[1], pad_T)[None].astype(np.int32)),
        "f0": jnp.asarray(rng.rand(1, pad_T).astype(np.float32)),
        "uv": jnp.zeros((1, pad_T), jnp.float32),
        "mels": jnp.zeros((1, pad_T, NMEL), jnp.float32),
    }
    key = jax.random.PRNGKey(3)
    timeit(f"diffusion sampling x{1000//SPEEDUP} NFE fp32",
           lambda p, b, r: model.infer(p, b, r, speedup=SPEEDUP)["mel_out"],
           params, batch, key)
    hp2 = HParams(**dict(hp, diff_compute_dtype="bfloat16"))
    model_bf = GaussianDiffusion(hp2)
    timeit(f"diffusion sampling x{1000//SPEEDUP} NFE bf16",
           lambda p, b, r: model_bf.infer(p, b, r, speedup=SPEEDUP)["mel_out"],
           params, batch, key)

    # single denoiser step (the scan body), fp32
    step_fn = lambda p, x, tb, c: model._dec.apply(
        p["denoise_fn"], model.net_cfg, x, tb, c)
    x_ex = jnp.zeros((1, pad_T, NMEL), jnp.float32)
    tb_ex = jnp.zeros((1,), jnp.int32)
    c_ex = jnp.zeros((1, pad_T, hp["hidden_size"]), jnp.float32)
    timeit("single denoiser step (DiffNet 20L x 384ch)",
           step_fn, params, x_ex, tb_ex, c_ex)

    # condition assembly (FS2 no_fs2 path: gather + pitch/energy embeds)
    from diffsvc_tpu.models import fs2

    timeit("cond assembly (fs2 no_fs2: gather+embeds)",
           lambda p, b: fs2.apply(p["fs2"], model.fs2_cfg, b["hubert"],
                                  b["mel2ph"], b["f0"], b["uv"],
                                  jnp.zeros_like(b["f0"]))["decoder_inp"],
           params, batch)

    # NSF harmonic source at full audio rate (sine_gen cumsums + noise)
    from diffsvc_tpu.vocoders import generator as gen

    src_p = gen.init_source_module(jax.random.PRNGKey(5))
    f0_up = jnp.asarray(np.abs(rng.randn(1, T * HOP)).astype(np.float32)
                        * 80 + 180)
    timeit("NSF source (sine_gen + merge) @ audio rate",
           lambda p, f, k: gen.source_module(p, k, f, SR)[0],
           src_p, f0_up, key)

    # host fetch of the full output waveform (the one big device->host copy
    # in serving; n44 f32 over the tunnel)
    big = jnp.zeros((n44,), jnp.float32) + 1.0
    t0 = time.time()
    for _ in range(3):
        np.asarray(big)
    log(f"| fetch {n44*4/1e6:.1f} MB wav out: {(time.time()-t0)/3*1e3:.1f} "
        "ms/fetch (host copy, unamortizable)")


if __name__ == "__main__":
    main()
