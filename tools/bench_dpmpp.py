"""DPM-Solver++(2M) sampler RTF vs the production PLMS, fused graph, TPU.

The sampling loop runs the 20-layer denoiser once per NFE (~300 us each,
doc/performance.md item 2), so the solver's step count is the single
biggest device-time knob left: PLMS at the reference default acc=20 does
50 NFE (~15 ms); DPM-Solver++(2M) is a second-order multistep solver that
reaches the same ODE accuracy in far fewer steps (tests/test_dpmpp.py
shows it beating PLMS at equal low NFE on an analytic score), so acc=50
(21 NFE) is the like-for-like quality point.

Variants (round-robin timed, same run — tunnel load drifts by the minute):
    prod_plms20     PLMS acc=20 (51 NFE), NSF-HiFiGAN pallas tail, int16 wire
    prod_dpmpp50    same graph, sampler=dpmpp acc=50 (21 NFE)
    prod_dpmpp100   turbo candidate: dpmpp acc=100 (11 NFE) + x0 clamp
    istft_dpmpp50   dpmpp acc=50 + iSTFT-head vocoder
    istft_dpmpp100  turbo + iSTFT head (fastest stack)

Usage: python tools/bench_dpmpp.py [--secs 10] [--runs 8]
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
    from diffsvc_tpu.vocoders import istft_head as ih

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
        voc_compute_dtype="", fused_output_int16=True)

    # test signal: vibrato tone with harmonics (same as bench.py)
    t = np.arange(int(SR * SECS)) / SR
    ph = np.cumsum(2 * np.pi * 220.0
                   * (1 + 0.03 * np.sin(2 * np.pi * 5.5 * t)) / SR)
    wav = (0.35 * np.sin(ph) + 0.18 * np.sin(2 * ph)).astype(np.float32)

    model = GaussianDiffusion(HParams(dict(base)))
    params = model.init_params(jax.random.PRNGKey(0))
    hub_cfg = hubert_model.HubertConfig()
    hub_params = hubert_model.init(jax.random.PRNGKey(1), hub_cfg)

    # NSF-HiFiGAN with the production packed+pallas-tail treatment
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

    variants = {}
    hp_prod = dict(base, pndm_speedup=20)
    variants["prod_plms20"] = FusedSvc(hp_prod, params, voc,
                                       hubert_params=hub_params,
                                       hubert_cfg=hub_cfg, speedup=20)
    hp_dpm = dict(base, pndm_speedup=50, sampler="dpmpp")
    variants["prod_dpmpp50"] = FusedSvc(hp_dpm, params, voc,
                                        hubert_params=hub_params,
                                        hubert_cfg=hub_cfg, speedup=50)
    # turbo candidate: 11 NFE (interval 100) — quality evidence in
    # runs/sampler_quality (dpmpp100_clip rows); clip is a scan-body
    # clamp with no measurable cost, so this timing stands for the
    # clipped profile too
    hp_turbo = dict(base, pndm_speedup=100, sampler="dpmpp",
                    sampler_clip_x0=1.0)
    variants["prod_dpmpp100"] = FusedSvc(hp_turbo, params, voc,
                                         hubert_params=hub_params,
                                         hubert_cfg=hub_cfg, speedup=100)
    hp_ist = dict(hp_dpm, vocoder="istftvocoder",
                  voc_compute_dtype="bfloat16",
                  istft_dim=512, istft_layers=8)
    icfg = ih.IstftVocoderConfig.from_hparams(HParams(dict(hp_ist)))
    ih_params = ih.init(jax.random.PRNGKey(5), icfg)
    variants["istft_dpmpp50"] = FusedSvc(
        hp_ist, params, SimpleNamespace(params=ih_params, cfg=icfg),
        hubert_params=hub_params, hubert_cfg=hub_cfg, speedup=50)
    hp_ist_turbo = dict(hp_ist, pndm_speedup=100, sampler_clip_x0=1.0)
    variants["istft_dpmpp100"] = FusedSvc(
        hp_ist_turbo, params, SimpleNamespace(params=ih_params, cfg=icfg),
        hubert_params=hub_params, hubert_cfg=hub_cfg, speedup=100)

    def _sync(out):
        np.asarray(out[0][-4:])

    log("| warmup (compile all variants)...")
    t0 = time.time()
    for name, f in variants.items():
        _sync(f(wav))
        log(f"|   {name} compiled, cumulative {time.time()-t0:.1f}s")

    times = {name: [] for name in variants}
    for i in range(args.runs):
        for name, f in variants.items():
            t0 = time.time()
            _sync(f(wav, rng=jax.random.PRNGKey(100 + i)))
            times[name].append(time.time() - t0)
    out = {}
    for name in variants:
        out[f"rtf_{name}"] = round(min(times[name]) / SECS, 5)
        log(f"| fused RTF {name}: {out[f'rtf_{name}']:.4f} (runs: "
            + " ".join(f"{x:.3f}" for x in times[name]) + ")")

    # pipelined serving: depth sweep — deeper pipelines hide more of the
    # per-dispatch tunnel latency + output fetch, exposing the device floor
    for name in ("prod_plms20", "prod_dpmpp50", "prod_dpmpp100",
                 "istft_dpmpp50", "istft_dpmpp100"):
        f = variants[name]
        for depth in (4, 8):
            best = 1e9
            for r in range(3):
                t0 = time.time()
                outs = [f(wav, rng=jax.random.PRNGKey(7 + depth * r + i))
                        for i in range(depth)]
                for o in outs:
                    _sync(o)
                best = min(best, (time.time() - t0) / (depth * SECS))
            key = f"rtf_{name}_pipe{depth}"
            out[key] = round(best, 5)
            log(f"| pipelined({depth}) RTF {name}: {best:.4f}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
