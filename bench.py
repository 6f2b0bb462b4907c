"""Benchmark harness: end-to-end 44.1 kHz SVC real-time factor on one chip.

Runs the full inference pipeline with random weights at production dims
(feature extraction: mel + AC-f0 + HuBERT; 1000-step diffusion with PLMS
speedup 20 -> 50 denoiser NFEs at 384ch x 20 layers; NSF-HiFiGAN vocoder at
openvpi dims) over 10 s of 44.1 kHz audio.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
value is the end-to-end RTF and vs_baseline = target_rtf / measured_rtf
(>1 = beating the BASELINE.md target of 0.05).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_rtt_probe():
    """No-op dispatch round-trip timer (shared protocol — see
    diffsvc_tpu/utils/rtt.py)."""
    from diffsvc_tpu.utils.rtt import make_rtt_probe as _mk

    return _mk()


def main():
    import jax

    if os.environ.get("BENCH_SMOKE"):
        # JAX_PLATFORMS env alone is ignored with the axon plugin present;
        # the config call must come before any jax use
        jax.config.update("jax_platforms", "cpu")

    from diffsvc_tpu.utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()
    import jax.numpy as jnp

    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.models import hubert as hubert_model
    from diffsvc_tpu.models.diffusion import GaussianDiffusion
    from diffsvc_tpu.ops import mel as mel_ops
    from diffsvc_tpu.ops.f0_ac import get_pitch_ac
    from diffsvc_tpu.ops.pitch import norm_interp_f0_np
    from diffsvc_tpu.data.features import get_align_uniform
    from diffsvc_tpu.utils.audio_io import resample
    from diffsvc_tpu.vocoders import generator as gen

    dev = jax.devices()[0]
    log(f"| device: {dev}")

    # load calibration: no-op dispatch RTT, measured before/throughout the
    # run so every published RTF comes with the tunnel load that produced it
    rtt_probe = make_rtt_probe()
    rtt_initial = sorted(rtt_probe() for _ in range(5))[2]
    log(f"| tunnel no-op dispatch RTT (median of 5): {rtt_initial*1e3:.1f} ms")

    SR = 44100
    SECS = 10.0
    HOP, NFFT, NMEL = 512, 2048, 128
    SPEEDUP = 20
    RES_CH, RES_L, VOC_CH = 384, 20, 512
    # BENCH_SMOKE=1: tiny dims + short audio so the FULL protocol (probes,
    # round-robin, retries, device-est math, JSON) runs on CPU in ~a minute
    # — a correctness check for bench.py itself, never a perf number
    smoke = bool(os.environ.get("BENCH_SMOKE"))
    if smoke:
        SECS = 2.0
        RES_CH, RES_L, VOC_CH = 32, 4, 64
        log("| BENCH_SMOKE: tiny dims, protocol-validation only")

    hp = HParams(
        audio_sample_rate=SR, audio_num_mel_bins=NMEL, fft_size=NFFT,
        hop_size=HOP, win_size=NFFT, fmin=40, fmax=16000,
        hidden_size=256, residual_layers=RES_L, residual_channels=RES_CH,
        dilation_cycle_length=4, timesteps=1000, K_step=1000,
        diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=NMEL, spec_min=[-5.0], spec_max=[0.0], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=False, use_spk_id=False,
        use_spk_embed=False, use_uv=False, pitch_norm="log", f0_bin=256,
        f0_min=40.0, f0_max=1100.0, pndm_speedup=SPEEDUP,
    )

    # synthetic vocal-like input
    t = np.arange(int(SR * SECS)) / SR
    f0_curve = 220.0 * (1 + 0.03 * np.sin(2 * np.pi * 5.5 * t))
    phase = np.cumsum(2 * np.pi * f0_curve / SR)
    wav = (0.35 * np.sin(phase) + 0.18 * np.sin(2 * phase)
           + 0.08 * np.sin(3 * phase)).astype(np.float32)

    # models (random weights, production dims)
    model = GaussianDiffusion(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    hub_cfg = hubert_model.HubertConfig()
    hub_params = hubert_model.init(jax.random.PRNGKey(1), hub_cfg)
    voc_cfg = gen.HifiGanConfig(
        num_mels=NMEL, upsample_initial_channel=VOC_CH,
        upsample_rates=(8, 8, 2, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4, 4),
        resblock="1", resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3, sampling_rate=SR,
        use_nsf=True)
    voc_params = gen.init(jax.random.PRNGKey(2), voc_cfg)

    infer_fn = jax.jit(lambda p, b, r: model.infer(p, b, r, speedup=SPEEDUP))
    last_batch = {}  # kept for the post-run MFU cost analysis
    voc_fn = jax.jit(lambda p, m, f0, r: gen.apply(p, voc_cfg, m, f0, r))
    hub_fn = lambda w: hubert_model.units(hub_params, hub_cfg, w)

    def pipeline():
        # --- feature extraction ---
        t0 = time.time()
        mel = mel_ops.wav2mel_nsf(
            jnp.asarray(wav), sr=SR, n_fft=NFFT, hop=HOP, win_length=NFFT,
            n_mels=NMEL, fmin=40.0, fmax=16000.0)
        mel.block_until_ready()
        t_mel = time.time() - t0

        t0 = time.time()
        f0, _ = get_pitch_ac(wav, mel.shape[0], hp)
        t_f0 = time.time() - t0

        t0 = time.time()
        wav16 = resample(wav, SR, 16000)
        units = hub_fn(jnp.asarray(wav16)[None])
        units.block_until_ready()
        t_hub = time.time() - t0

        # --- condition assembly ---
        t0 = time.time()
        T = mel.shape[0]
        pad_T = -(-T // 128) * 128
        mel2ph = np.zeros((1, pad_T), np.int32)
        mel2ph[0, :T] = get_align_uniform(T, units.shape[1])
        f0n, uv = norm_interp_f0_np(f0)
        f0b = np.zeros((1, pad_T), np.float32)
        f0b[0, :T] = f0n
        uvb = np.zeros((1, pad_T), np.float32)
        uvb[0, :T] = uv
        melb = np.full((1, pad_T, NMEL), 0.0, np.float32)
        melb[0, :T] = np.asarray(mel)
        batch = {"hubert": jnp.asarray(units), "mel2ph": jnp.asarray(mel2ph),
                 "f0": jnp.asarray(f0b), "uv": jnp.asarray(uvb),
                 "mels": jnp.asarray(melb)}
        last_batch.update(batch)
        t_cond = time.time() - t0

        # --- diffusion denoise loop ---
        t0 = time.time()
        out = infer_fn(params, batch, jax.random.PRNGKey(3))
        out["mel_out"].block_until_ready()
        t_diff = time.time() - t0

        # --- vocoder ---
        t0 = time.time()
        mel_pred = out["mel_out"][:, :T, :] * mel_ops.LN_10
        f0_voc = jnp.asarray(f0[None, :T])
        wav_out = voc_fn(voc_params, mel_pred, f0_voc, jax.random.PRNGKey(4))
        wav_out.block_until_ready()
        t_voc = time.time() - t0

        return dict(mel=t_mel, f0=t_f0, hubert=t_hub, cond=t_cond,
                    diffusion=t_diff, vocoder=t_voc, T=T)

    log("| warmup (compile)...")
    tw = time.time()
    stats = pipeline()
    log(f"| warmup done in {time.time() - tw:.1f}s: "
        + " ".join(f"{k}={v:.3f}s" for k, v in stats.items() if k != "T"))

    runs = []
    for i in range(3):
        rtt_i = rtt_probe()
        s = pipeline()
        s["_rtt"] = rtt_i
        total = sum(v for k, v in s.items() if k not in ("T", "_rtt"))
        runs.append((total, s))
        log(f"| run{i}: total={total:.3f}s rtt={rtt_i*1e3:.0f}ms "
            + " ".join(f"{k}={v:.3f}" for k, v in s.items()
                       if k not in ("T", "_rtt")))

    best_total, best = min(runs, key=lambda x: x[0])
    rtf_modular = best_total / SECS
    frames_per_sec = best["T"] * (hp["K_step"] // SPEEDUP) / best["diffusion"]
    log(f"| denoise mel-frames/sec (x{hp['K_step'] // SPEEDUP} NFE): {frames_per_sec:.0f}")

    # MFU of the sampling loop, from analytic matmul FLOPs (XLA
    # cost_analysis undercounts the scan body). Per NFE: input 1x1 +
    # L x (k=3 dilated conv to 2C + 1x1 out to 2C) + skip/output 1x1;
    # the hoisted conditioner projections are counted ONCE. Peak: v5e
    # bf16/fp32-acc single-pass MXU 197 TFLOP/s (v4: 275).
    NFE = hp["K_step"] // SPEEDUP
    pad_T = last_batch["f0"].shape[1]
    C, H, M, L = (hp["residual_channels"], hp["hidden_size"], NMEL,
                  hp["residual_layers"])
    per_step = 2 * pad_T * (M * C + L * (3 + 1) * C * 2 * C + C * C + C * M)
    cond_once = 2 * pad_T * L * H * 2 * C
    flops = per_step * NFE + cond_once
    kind = str(getattr(dev, "device_kind", dev)).lower()
    peak = 275e12 if "v4" in kind else 197e12
    mfu = flops / best["diffusion"] / peak
    # device-time MFU: the sampling loop is ONE dispatch, so wall time =
    # dispatch RTT + device compute; subtracting the same-run no-op RTT
    # recovers the chip-side number (VERDICT r3 weak #7: the raw wall MFU
    # is dispatch-dominated and misreads as chip utilization)
    t_diff_dev = max(best["diffusion"] - best["_rtt"], 1e-6)
    mfu_dev = flops / t_diff_dev / peak
    log(f"| sampling-loop FLOPs: {flops/1e12:.2f} TFLOP over {NFE} NFE, "
        f"MFU {100*mfu:.1f}% wall / {100*mfu_dev:.1f}% device-est "
        f"of {peak/1e12:.0f} TFLOP/s peak")

    # PRODUCTION-path sampling MFU: the same loop in bf16, which is what
    # the fused serving graph runs per NFE (and what takes the Pallas
    # stack kernel on TPU). The fp32 `diffusion` leg above deliberately
    # keeps the XLA scan (the quality-reference path; the kernel gate
    # rejects fp32 because Mosaic f32 dots are single-pass bf16), so the
    # two MFU fields measure DIFFERENT code paths — reconciled per-NFE in
    # tools/mfu_decompose.py / BASELINE.md r5.
    hp16 = type(hp)(hp)
    hp16["diff_compute_dtype"] = "bfloat16"
    model16 = GaussianDiffusion(hp16)
    infer16_fn = jax.jit(lambda p, b, r: model16.infer(p, b, r,
                                                       speedup=SPEEDUP))
    batch16 = {k: last_batch[k] for k in
               ("hubert", "mel2ph", "f0", "uv", "mels")}
    infer16_fn(params, batch16,
               jax.random.PRNGKey(3))["mel_out"].block_until_ready()
    t16_best, rtt16_best = float("inf"), None
    for _ in range(3):
        rtt_i = rtt_probe()
        t0 = time.time()
        infer16_fn(params, batch16,
                   jax.random.PRNGKey(3))["mel_out"].block_until_ready()
        wall = time.time() - t0
        if wall < t16_best:
            t16_best, rtt16_best = wall, rtt_i
    t16_dev = max(t16_best - rtt16_best, 1e-6)
    mfu16_dev = flops / t16_dev / peak
    log(f"| bf16 sampling loop (production path): {t16_best:.3f}s wall / "
        f"{t16_dev:.3f}s device-est -> MFU {100*mfu16_dev:.1f}% device-est")
    log(f"| modular end-to-end RTF: {rtf_modular:.4f}")

    # ---- fused single-dispatch graph (the serving path) ----
    from types import SimpleNamespace

    from diffsvc_tpu.infer.fused import FusedSvc

    hp["vocoder"] = "nsf_hifigan"
    voc = SimpleNamespace(params=voc_params, cfg=voc_cfg)
    # FusedSvc snapshots hp at construction, so the fp32 variant is
    # isolated from the bf16 mutations below even though tracing is lazy
    fused = FusedSvc(hp, params, voc, hubert_params=hub_params,
                     hubert_cfg=hub_cfg, speedup=SPEEDUP)
    def _sync(out):
        # block by FETCHING a few samples — on the tunneled device,
        # block_until_ready alone has been observed to return early,
        # yielding bogus sub-ms timings; a host read cannot
        np.asarray(out[0][-4:])

    # --- all fused variants, timed ROUND-ROBIN: the tunnel's load drifts
    # on minute scales, so sequential per-variant loops produce
    # self-contradictory orderings (an int16-output variant once measured
    # SLOWER than its own float base). Interleaving one call per variant
    # per round gives every variant the same drift.
    variants = {"fp32": fused}

    hp["diff_compute_dtype"] = "bfloat16"
    hp["voc_compute_dtype"] = "bfloat16"
    hp["hubert_compute_dtype"] = "bfloat16"
    variants["bf16"] = FusedSvc(hp, params, voc, hubert_params=hub_params,
                                hubert_cfg=hub_cfg, speedup=SPEEDUP)

    # bf16 pipeline + channel-packed fp32 vocoder (tools/bench_voc.py:
    # packed fp32 beats both plain fp32 and plain bf16; packed bf16
    # regresses — BASELINE.md r3: MXU pass-bound + bf16 tile relayouts)
    hp_mix = dict(hp)
    hp_mix["voc_compute_dtype"] = ""
    voc_packed = SimpleNamespace(
        params=voc_params, cfg=voc_cfg, pack_lanes=128,
        run_params=gen.pack_params(voc_params, voc_cfg, 128))
    variants["bf16_packed_voc"] = FusedSvc(
        hp_mix, params, voc_packed, hubert_params=hub_params,
        hubert_cfg=hub_cfg, speedup=SPEEDUP)

    # + fused Pallas vocoder tail (ops/pallas/vocoder_tail.py)
    tail_built = gen.build_tail_params(voc_params, voc_packed.run_params,
                                       voc_cfg, 128)
    if tail_built is not None:
        plan, tail_params = tail_built
        voc_tail = SimpleNamespace(
            params=voc_params, cfg=voc_cfg, pack_lanes=128,
            run_params=tail_params, tail_plan=plan)
        variants["bf16_pallas_tail"] = FusedSvc(
            hp_mix, params, voc_tail, hubert_params=hub_params,
            hubert_cfg=hub_cfg, speedup=SPEEDUP)

    # + int16 device output (the wire format; halves the ~24 ms output
    # fetch over the tunnel — what flask/VST serving actually ships)
    voc_best = voc_tail if tail_built is not None else voc_packed
    hp_i16 = dict(hp_mix)
    hp_i16["fused_output_int16"] = True
    variants["int16_out"] = FusedSvc(
        hp_i16, params, voc_best, hubert_params=hub_params,
        hubert_cfg=hub_cfg, speedup=SPEEDUP)

    # + int16 INPUT wire (fused_input_int16): the input upload is the
    # same 1.8 MB the output fetch was before int16_out halved it, and
    # the serving sources (VST buffers, HTTP posts) are PCM16 anyway —
    # decode on device. flask defaults both wire flags on, so THIS is
    # the production serving config from round 4 on (int16_out rides
    # along for cross-round continuity).
    hp_io = dict(hp_i16)
    hp_io["fused_input_int16"] = True
    variants["int16_io"] = FusedSvc(
        hp_io, params, voc_best, hubert_params=hub_params,
        hubert_cfg=hub_cfg, speedup=SPEEDUP)

    # + whole-ladder PLMS Pallas kernel (ops/pallas/plms_ladder.py): every
    # denoiser evaluation AND the sampler update in ONE pallas_call, x
    # resident in VMEM across the trajectory. Measured 280 us/NFE (77.4%
    # MFU) vs the scan loop's 364 us (59.6%) at prod dims
    # (runs/mfu_decompose) — this is the production serving config from
    # round 5 on (configs/base.yaml defaults sampler_pallas_ladder: auto);
    # int16_io (same wire, XLA-scan sampler) rides along for continuity.
    hp_lad = dict(hp_io)
    hp_lad["sampler_pallas_ladder"] = "auto"
    variants["ladder_int16"] = FusedSvc(
        hp_lad, params, voc_best, hubert_params=hub_params,
        hubert_cfg=hub_cfg, speedup=SPEEDUP)

    # beyond-reference DPM-Solver++(2M) at acc=50 (21 NFE vs PLMS acc=20's
    # 51) on the SAME production stack — the sampler step count is the
    # biggest remaining device-time knob (~18 ms of sampling at 50 NFE).
    # Ride-along diagnostic; headline stays the reference protocol (acc=20).
    # Built on hp_io (full int16 wire) so the sampler ride-alongs are
    # apples-to-apples with the int16_io headline — the 2026-08-19 record
    # had them paying the f32 upload the headline no longer pays.
    hp_dpm = dict(hp_io)
    hp_dpm["sampler"] = "dpmpp"
    hp_dpm["pndm_speedup"] = 50
    # the shipped profiles ride the whole-ladder kernel since r5 (the
    # superset program covers dpmpp and the turbo x0-clamp; parity in
    # tests/test_plms_ladder.py), same as configs/base.yaml's auto default
    hp_dpm["sampler_pallas_ladder"] = "auto"
    variants["dpmpp50_int16"] = FusedSvc(
        hp_dpm, params, voc_best, hubert_params=hub_params,
        hubert_cfg=hub_cfg, speedup=50)

    # the shipped TURBO profile (configs/config_44k_turbo.yaml): dpmpp
    # acc=100 (11 NFE) + x0 clamp, quality-matched to the fast profile on
    # a production-dims score (BASELINE.md turbo table). Ride-along so the
    # round record carries the turbo number measured in the same window.
    hp_turbo = dict(hp_dpm)
    hp_turbo["pndm_speedup"] = 100
    hp_turbo["sampler_clip_x0"] = 1.0
    variants["turbo11_int16"] = FusedSvc(
        hp_turbo, params, voc_best, hubert_params=hub_params,
        hubert_cfg=hub_cfg, speedup=100)

    # beyond-reference iSTFT-head vocoder in the same fused+int16 config
    # (BASELINE.md: frame-rate backbone + inverse-rDFT, no MXU-pass-bound
    # tail; random weights time identically to trained ones). Ride-along
    # diagnostic only — the headline stays the reference-checkpoint-
    # compatible NSF-HiFiGAN config.
    try:
        from diffsvc_tpu.vocoders import istft_head as ih

        hp_istft = dict(hp_io)
        hp_istft["vocoder"] = "istftvocoder"
        hp_istft["voc_compute_dtype"] = "bfloat16"
        hp_istft["istft_dim"] = 512
        hp_istft["istft_layers"] = 8
        icfg = ih.IstftVocoderConfig.from_hparams(HParams(dict(hp_istft)))
        ih_params = ih.init(jax.random.PRNGKey(5), icfg)
        variants["istft_int16"] = FusedSvc(
            hp_istft, params, SimpleNamespace(params=ih_params, cfg=icfg),
            hubert_params=hub_params, hubert_cfg=hub_cfg, speedup=SPEEDUP)
    except Exception as e:  # diagnostic variant must never sink the bench
        log(f"| istft variant skipped: {e!r}")

    log("| fused warmup (compile all variants)...")
    t0 = time.time()
    for name, f in variants.items():
        _sync(f(wav))
    log(f"| fused warmup {time.time() - t0:.1f}s")

    times = {name: [] for name in variants}
    round_rtts = []

    def fused_round(i):
        round_rtts.append(rtt_probe())
        for name, f in variants.items():
            t0 = time.time()
            _sync(f(wav, rng=jax.random.PRNGKey(100 + i)))
            times[name].append(time.time() - t0)

    for i in range(8):
        fused_round(i)
    # bounded retry: tunnel load drifts 1.5-2x between ~minute windows; if
    # this run never saw a quiet window (headline spread > 1.5x), buy up to
    # 4 more round-robin rounds so the published min tracks the code, not
    # the weather (VERDICT r3 #1)
    headline_name = ("ladder_int16" if "ladder_int16" in variants
                     else "int16_io" if "int16_io" in variants
                     else "int16_out" if "int16_out" in variants
                     else "bf16_packed_voc")
    extra = 0
    while (max(times[headline_name]) / min(times[headline_name]) > 1.5
           and extra < 4):
        fused_round(100 + extra)
        extra += 1
        log(f"| headline spread {max(times[headline_name])/min(times[headline_name]):.2f}x"
            f" after retry round {extra}")

    rtt_med = sorted(round_rtts)[len(round_rtts) // 2]
    log(f"| per-round no-op RTT (ms): "
        + " ".join(f"{r*1e3:.0f}" for r in round_rtts)
        + f"  median {rtt_med*1e3:.1f}")
    rtfs, rtfs_dev = {}, {}
    for name in variants:
        rtfs[name] = min(times[name]) / SECS
        # device-time estimate: each fused call is one dispatch + a 4-float
        # fetch, so wall - same-round no-op RTT ~= device compute
        dev_times = [max(t - r, 1e-6)
                     for t, r in zip(times[name], round_rtts)]
        rtfs_dev[name] = min(dev_times) / SECS
        log(f"| fused RTF {name}: {rtfs[name]:.4f} wall / "
            f"{rtfs_dev[name]:.4f} device-est (runs: "
            + " ".join(f"{t:.3f}" for t in times[name]) + ")")
    rtf_fused = rtfs["fp32"]
    rtf_bf16 = rtfs["bf16"]
    rtf_mix = rtfs["bf16_packed_voc"]
    rtf_tail = rtfs.get("bf16_pallas_tail", float("nan"))
    rtf_i16 = rtfs["int16_out"]
    rtf_io = rtfs.get("int16_io", float("nan"))
    rtf_lad = rtfs.get("ladder_int16", float("nan"))
    rtf_istft = rtfs.get("istft_int16", float("nan"))
    rtf_dpm = rtfs.get("dpmpp50_int16", float("nan"))
    rtf_turbo = rtfs.get("turbo11_int16", float("nan"))
    fused_mix = variants["bf16_packed_voc"]
    fused_prod = variants.get("ladder_int16",
                              variants.get("int16_io",
                                           variants["int16_out"]))

    # steady-state serving throughput: 8 dispatches in flight, sync once —
    # amortizes the per-call host->device round trip (the tunnel on this
    # bench host), i.e. the RTF a pipelined server actually sustains.
    # Depth 8 beats 4 (tools/bench_dpmpp.py sweep: 0.0073 vs 0.0078 prod).
    # Min over 3 bursts: a single burst is one ~2 s tunnel window, and
    # tunnel load drifts 1.5-2x between windows — the same reason the
    # single-stream variants take min-of-8 runs.
    tp = []
    for r in range(3):
        t0 = time.time()
        outs = [fused_prod(wav, rng=jax.random.PRNGKey(10 + 8 * r + i))
                for i in range(8)]
        for o in outs:
            _sync(o)
        tp.append((time.time() - t0) / (8 * SECS))
    rtf_tp = min(tp)
    log(f"| pipelined serving RTF (8 in flight, production config): {rtf_tp:.4f}"
        f" (per-burst: " + " ".join(f"{t:.4f}" for t in tp) + ")")

    # batched serving: N chunks in ONE vmapped dispatch — at batch 1 the
    # chip is overhead/latency bound (MFU ~3%), so batching slicer chunks
    # recovers the throughput headroom. Uses the production (int16 wire)
    # config since late r4: at batch 4 the wire moves 4x(in+out) = 14 MB
    # as f32, so the wire format dominates this number on the tunnel
    # (protocol note in BASELINE.md; the vmapped graph keeps packed
    # convs but not the Pallas tail).
    outs = fused_prod.batched([wav] * 4)
    for o in outs:
        np.asarray(o[0][-4:])
    bt = []
    for i in range(3):
        t0 = time.time()
        outs = fused_prod.batched([wav] * 4, rng=jax.random.PRNGKey(50 + i))
        for o in outs:
            np.asarray(o[0][-4:])
        bt.append(time.time() - t0)
    rtf_batched = min(bt) / (4 * SECS)
    log(f"| batched serving RTF (batch 4, production int16 wire, one "
        f"dispatch): {rtf_batched:.4f}"
        f" (runs: " + " ".join(f"{t:.3f}" for t in bt) + ")")

    # headline = THE production serving config (what setup_serving picks on
    # TPU): fused single-dispatch graph, bf16 denoiser/hubert (sampler math
    # fp32), Pallas-tail vocoder when supported else packed fp32 — NOT a min
    # over variants, so a regression in the shipped config cannot hide
    # behind another variant winning the run.  Per-variant minima ride
    # along as diagnostic fields; min-of-8 per variant guards against
    # tunnel-latency variance only.
    # production = fused + pallas tail + int16 wire input AND output +
    # whole-ladder PLMS sampler kernel (what the serving entrypoints
    # default to on TPU since r5); NaN-safe fallback chain
    rtf = rtf_lad if rtf_lad == rtf_lad else (
        rtf_io if rtf_io == rtf_io else (
            rtf_i16 if rtf_i16 == rtf_i16 else (
                rtf_tail if rtf_tail == rtf_tail else rtf_mix)))
    rtf_dev = rtfs_dev.get(headline_name, float("nan"))
    spread = max(times[headline_name]) / min(times[headline_name])
    # fused-graph device-time MFU: sampling-loop matmul FLOPs over the
    # headline's RTT-subtracted time (sampling is ~all the FLOPs; vocoder/
    # hubert add <10%, so this is a slight undercount, not an overcount)
    mfu_fused_dev = (flops / max(rtf_dev * SECS, 1e-6) / peak
                     if rtf_dev == rtf_dev else float("nan"))
    log(f"| end-to-end RTF (production fused serving): {rtf:.4f} wall / "
        f"{rtf_dev:.4f} device-est (target < 0.05); headline spread "
        f"{spread:.2f}x, tunnel RTT median {rtt_med*1e3:.1f} ms")
    print(json.dumps({
        "metric": "e2e_rtf_44k1_10s_acc20",
        "value": round(rtf, 5),
        "unit": "rtf",
        "vs_baseline": round(0.05 / rtf, 3),
        # load calibration (VERDICT r3 #1): every wall RTF below includes
        # one tunnel dispatch RTT; rtf_device_est subtracts the same-round
        # no-op RTT. If tunnel_rtt_ms is high or headline_spread_x is
        # large, trust rtf_device_est for cross-round code comparisons.
        "tunnel_rtt_ms": round(rtt_med * 1e3, 1),
        "tunnel_rtt_ms_initial": round(rtt_initial * 1e3, 1),
        "tunnel_rtt_ms_minmax": [round(min(round_rtts) * 1e3, 1),
                                 round(max(round_rtts) * 1e3, 1)],
        "rtf_device_est": round(rtf_dev, 5) if rtf_dev == rtf_dev else None,
        "headline_spread_x": round(spread, 2),
        "mfu_sampling_device_pct": round(100 * mfu_dev, 1),
        "mfu_sampling_bf16_device_pct": round(100 * mfu16_dev, 1),
        "mfu_fused_device_pct": (round(100 * mfu_fused_dev, 1)
                                 if mfu_fused_dev == mfu_fused_dev else None),
        "rtf_fp32": round(rtf_fused, 5),
        "rtf_bf16": round(rtf_bf16, 5),
        "rtf_bf16_packed_voc": round(rtf_mix, 5),
        "rtf_bf16_pallas_tail": round(rtf_tail, 5) if rtf_tail == rtf_tail else None,
        "rtf_int16_out": round(rtf_i16, 5) if rtf_i16 == rtf_i16 else None,
        "rtf_int16_io": round(rtf_io, 5) if rtf_io == rtf_io else None,
        "rtf_ladder_int16": round(rtf_lad, 5) if rtf_lad == rtf_lad else None,
        "rtf_istft_voc": round(rtf_istft, 5) if rtf_istft == rtf_istft else None,
        "rtf_dpmpp50": round(rtf_dpm, 5) if rtf_dpm == rtf_dpm else None,
        "rtf_turbo11": round(rtf_turbo, 5) if rtf_turbo == rtf_turbo else None,
        "rtf_device_by_variant": {k: round(v, 5)
                                  for k, v in sorted(rtfs_dev.items())},
        "rtf_pipelined": round(rtf_tp, 5),
        "rtf_pipelined_bursts": [round(t, 5) for t in tp],
        "rtf_batched": round(rtf_batched, 5),
    }))


if __name__ == "__main__":
    main()
