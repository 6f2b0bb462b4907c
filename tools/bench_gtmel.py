"""Shallow-diffusion (use_gt_mel) fused serving RTF on the real TPU.

The reference's shallow mode (infer.py run_clip -> diffusion.py:270-276)
starts sampling from the INPUT's q_sampled mel at ``add_noise_step``
instead of pure noise at K_step, so the PLMS ladder shrinks from
K_step/speedup to add_noise_step/speedup denoiser evals — at the default
add_noise_step=500 that halves the largest device-time block
(doc/performance.md per-stage table). This measures the fused graph's RTF
at full / 500 / 300 against the same production stack (NSF-HiFiGAN packed
+ pallas tail, bf16 denoiser, int16 wire), round-robin interleaved so
tunnel drift hits all variants equally.

Usage: python tools/bench_gtmel.py [--secs 10] [--runs 8]
"""

import argparse
import json
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--runs", type=int, default=8)
    args = ap.parse_args()

    from diffsvc_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax
    import numpy as np

    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.infer.fused import FusedSvc
    from diffsvc_tpu.models import hubert as hubert_model
    from diffsvc_tpu.models.diffusion import GaussianDiffusion
    from diffsvc_tpu.vocoders import generator as gen

    log(f"| device: {jax.devices()[0]}")
    SR, HOP, NFFT, NMEL = 44100, 512, 2048, 128
    SECS = args.secs

    base = dict(
        audio_sample_rate=SR, audio_num_mel_bins=NMEL, fft_size=NFFT,
        hop_size=HOP, win_size=NFFT, fmin=40, fmax=16000,
        hidden_size=256, residual_layers=20, residual_channels=384,
        dilation_cycle_length=4, timesteps=1000, K_step=1000,
        diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=NMEL, spec_min=[-5.0], spec_max=[0.0], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=False, use_spk_id=False,
        use_spk_embed=False, use_uv=False, pitch_norm="log", f0_bin=256,
        f0_min=40.0, f0_max=1100.0, vocoder="nsf_hifigan",
        diff_compute_dtype="bfloat16", hubert_compute_dtype="bfloat16",
        voc_compute_dtype="", fused_output_int16=True, pndm_speedup=20)

    t = np.arange(int(SR * SECS)) / SR
    ph = np.cumsum(2 * np.pi * 220.0
                   * (1 + 0.03 * np.sin(2 * np.pi * 5.5 * t)) / SR)
    wav = (0.35 * np.sin(ph) + 0.18 * np.sin(2 * ph)).astype(np.float32)

    model = GaussianDiffusion(HParams(dict(base)))
    params = model.init_params(jax.random.PRNGKey(0))
    hub_cfg = hubert_model.HubertConfig()
    hub_params = hubert_model.init(jax.random.PRNGKey(1), hub_cfg)

    voc_cfg = gen.HifiGanConfig(num_mels=NMEL, sampling_rate=SR,
                                upsample_rates=(8, 8, 2, 2, 2),
                                upsample_kernel_sizes=(16, 16, 4, 4, 4),
                                use_nsf=True)
    voc_params = gen.init(jax.random.PRNGKey(2), voc_cfg)
    run_params = gen.pack_params(voc_params, voc_cfg, 128)
    tail_built = gen.build_tail_params(voc_params, run_params, voc_cfg, 128)
    if tail_built is not None:
        plan, tail_params = tail_built
        voc = SimpleNamespace(params=voc_params, cfg=voc_cfg, pack_lanes=128,
                              run_params=tail_params, tail_plan=plan)
    else:
        voc = SimpleNamespace(params=voc_params, cfg=voc_cfg, pack_lanes=128,
                              run_params=run_params)

    fused = FusedSvc(dict(base), params, voc, hubert_params=hub_params,
                     hubert_cfg=hub_cfg, speedup=20)
    # (name, call kwargs): full noise vs shallow starts
    variants = {
        "prod_full": {},
        "gtmel_500": dict(use_gt_mel=True, add_noise_step=500),
        "gtmel_300": dict(use_gt_mel=True, add_noise_step=300),
    }

    def _sync(out):
        np.asarray(out[0][-4:])

    log("| warmup (compile all variants)...")
    t0 = time.time()
    for name, kw in variants.items():
        _sync(fused(wav, **kw))
        log(f"|   {name} compiled, cumulative {time.time()-t0:.1f}s")

    times = {name: [] for name in variants}
    for i in range(args.runs):
        for name, kw in variants.items():
            t0 = time.time()
            _sync(fused(wav, rng=jax.random.PRNGKey(100 + i), **kw))
            times[name].append(time.time() - t0)
    out = {}
    for name in variants:
        out[f"rtf_{name}"] = round(min(times[name]) / SECS, 5)
        log(f"| fused RTF {name}: {out[f'rtf_{name}']:.4f} (runs: "
            + " ".join(f"{x:.3f}" for x in times[name]) + ")")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
