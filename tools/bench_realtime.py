"""Realtime (DAW/VST) serving benchmark: short-buffer latency on TPU.

The reference's realtime path is ``flask_api.py:19-54``: the DAW posts
0.2-1 s buffers, inference runs with acc=50 (20 denoiser NFEs), no crepe,
no pe.  This harness measures what that use case actually sees on one
v5e chip through the fused single-dispatch graph (the flask --fused path):

- cold-start per length bucket: first-call wall time (XLA compile over the
  tunnel; the persistent compile cache in ~/.cache/diffsvc_tpu/xla makes
  later process restarts warm — rerun this tool to see warm numbers),
- steady-state per-buffer latency: p50 / p95 over N sequential calls
  (realtime requires p95 < buffer duration),
- pipelined latency with 2 requests in flight (a DAW stream overlaps the
  next buffer with the current one),
- the bucket set size (bounded by fused_bucket_samples).

Usage: python tools/bench_realtime.py [--acc 50] [--runs 30]
       [--bucket-hops 16] [--durs 0.2,0.35,0.5,1.0]
       [--profile prod|fast|gtmel]
Prints one JSON line on stdout; logs to stderr.

``--profile`` picks the serving levers for short buffers (VERDICT r3 #7):
- prod: PLMS at --acc (reference protocol; 1000/acc NFE),
- fast: DPM-Solver++(2M) + x0 clamp at --acc (config_44k_fast; at
  acc=100 that's 11 NFE),
- gtmel: shallow diffusion (use_gt_mel, add_noise_step 500) — the input
  buffer's own mel is the diffusion start, 500/acc NFE.

``--stream`` measures the click-free continuous mode (flask_api --stream,
diffsvc_tpu/infer/streaming.py) instead of independent per-buffer
conversion: each call converts [context_ms of real history ++ buffer],
so the compiled window is bigger (the price of continuity) and the rows
report the latency of the stateful stream call. Pipelined columns are
omitted (the stream is order-dependent by construction).

Every sample is paired with a no-op dispatch RTT probe (the bench.py r4
load calibration): rows report the raw p50/p95 AND the stall-filtered
p95 (samples whose same-iteration probe exceeded 2.5x the run's median
RTT are tunnel stalls, not serving capability).
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
    ap.add_argument("--acc", type=int, default=50)
    ap.add_argument("--runs", type=int, default=30)
    ap.add_argument("--bucket-hops", type=int, default=16)
    ap.add_argument("--durs", default="0.2,0.35,0.5,1.0")
    ap.add_argument("--profile", default="prod",
                    choices=("prod", "fast", "gtmel"))
    ap.add_argument("--stream", action="store_true",
                    help="measure the click-free streaming mode (left "
                         "context + held-tail crossfade) instead of "
                         "independent per-buffer conversion")
    ap.add_argument("--stream-context-ms", type=float, default=100.0)
    ap.add_argument("--stream-crossfade-ms", type=float, default=40.0)
    args = ap.parse_args()
    durs = [float(d) for d in args.durs.split(",")]

    import jax

    from diffsvc_tpu.utils.compile_cache import enable as _cc
    _cc()
    import numpy as np

    from types import SimpleNamespace

    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.infer.fused import FusedSvc
    from diffsvc_tpu.models import hubert as hubert_model
    from diffsvc_tpu.models.diffusion import GaussianDiffusion
    from diffsvc_tpu.vocoders import generator as gen

    log(f"| device: {jax.devices()[0]}")
    SR, HOP, NFFT, NMEL = 44100, 512, 2048, 128
    SPEEDUP = int(args.acc)
    BUCKET = HOP * args.bucket_hops

    hp = HParams(
        audio_sample_rate=SR, audio_num_mel_bins=NMEL, fft_size=NFFT,
        hop_size=HOP, win_size=NFFT, fmin=40, fmax=16000,
        hidden_size=256, residual_layers=20, residual_channels=384,
        dilation_cycle_length=4, timesteps=1000, K_step=1000,
        diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=NMEL, spec_min=[-5.0], spec_max=[0.0], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=False, use_spk_id=False,
        use_uv=False, pitch_norm="log", f0_bin=256, f0_min=40.0,
        f0_max=1100.0, pndm_speedup=SPEEDUP, vocoder="nsf_hifigan",
        fused_bucket_samples=BUCKET,
        fused_output_int16=True,   # the wire format (flask default)
        diff_compute_dtype="bfloat16", hubert_compute_dtype="bfloat16")
    # profile levers: "fast" changes the compiled sampler via hp; "gtmel"
    # (shallow diffusion) is selected PER CALL — FusedSvc only honors the
    # use_gt_mel call kwarg (fused.py _get_fn), hp keys would be dead
    call_kw = {}
    if args.profile == "fast":
        hp["sampler"] = "dpmpp"
        hp["sampler_clip_x0"] = 1.0
    elif args.profile == "gtmel":
        call_kw = dict(use_gt_mel=True, add_noise_step=500)

    model = GaussianDiffusion(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    hub_cfg = hubert_model.HubertConfig()
    hub_params = hubert_model.init(jax.random.PRNGKey(1), hub_cfg)
    voc_cfg = gen.HifiGanConfig(
        num_mels=NMEL, upsample_initial_channel=512,
        upsample_rates=(8, 8, 2, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4, 4), resblock="1",
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3, sampling_rate=SR,
        use_nsf=True)
    voc_params = gen.init(jax.random.PRNGKey(2), voc_cfg)
    packed = gen.pack_params(voc_params, voc_cfg, 128)
    voc = SimpleNamespace(params=voc_params, cfg=voc_cfg, pack_lanes=128,
                          run_params=packed)
    built = (gen.build_tail_params(voc_params, packed, voc_cfg, 128)
             if gen.tail_kernel_enabled(hp) else None)  # auto = TPU only
    if built is not None:
        plan, tail_params = built
        voc.run_params, voc.tail_plan = tail_params, plan
        log("| vocoder: pallas tail")
    fused = FusedSvc(hp, params, voc, hubert_params=hub_params,
                     hubert_cfg=hub_cfg, speedup=SPEEDUP)

    def make_buf(dur, seed=0):
        t = np.arange(int(SR * dur)) / SR
        f0c = 220.0 * (1 + 0.03 * np.sin(2 * np.pi * 5.5 * t + seed))
        ph = np.cumsum(2 * np.pi * f0c / SR)
        return (0.35 * np.sin(ph) + 0.18 * np.sin(2 * ph)).astype(np.float32)

    def _sync(out):
        np.asarray(out[0][-4:])

    # no-op dispatch RTT probe (the SAME protocol object bench.py uses),
    # timed alongside every latency sample
    from diffsvc_tpu.utils.rtt import make_rtt_probe, median_rtt

    probe = make_rtt_probe()
    rtt0 = median_rtt(probe)
    log(f"| tunnel no-op RTT (median of 5): {rtt0*1e3:.1f} ms")

    if args.stream:
        from diffsvc_tpu.infer.streaming import StreamingConverter

    rows = []
    for dur in durs:
        wav = make_buf(dur)
        if args.stream:
            # stateful continuous mode: each steady-state call converts
            # [context ++ buffer] and returns host float audio (the wire
            # fetch is part of the streaming contract — the crossfade
            # needs the samples; int16 ~26 KB per 0.3 s window, <1 ms)
            kiter = [0]

            def convert(w):
                kiter[0] += 1
                audio, _f0, _mel = fused(
                    w, rng=jax.random.PRNGKey(kiter[0]), **call_kw)
                out = FusedSvc.to_float(np.asarray(audio))[: len(w)]
                if len(out) < len(w):
                    out = np.pad(out, (0, len(w) - len(out)))
                return out

            sc = StreamingConverter(convert, SR,
                                    context_ms=args.stream_context_ms,
                                    crossfade_ms=args.stream_crossfade_ms)
            t0 = time.time()
            sc(wav)                    # buffer-only window (first call)
            sc(make_buf(dur, seed=1))  # context+buffer window (2nd compile)
            cold = time.time() - t0
            lat, rtts = [], []
            for i in range(args.runs):
                rtts.append(probe())
                t0 = time.time()
                sc(make_buf(dur, seed=2 + i))
                lat.append(time.time() - t0)
        else:
            t0 = time.time()
            _sync(fused(wav, **call_kw))
            cold = time.time() - t0
            lat, rtts = [], []
            for i in range(args.runs):
                rtts.append(probe())
                t0 = time.time()
                _sync(fused(make_buf(dur, seed=i),
                            rng=jax.random.PRNGKey(i), **call_kw))
                lat.append(time.time() - t0)
        lat = np.array(lat)
        rtts = np.array(rtts)
        rtt_med = float(np.median(rtts))
        ok = rtts <= 2.5 * rtt_med   # same-iteration tunnel-stall filter
        lat_ok = lat[ok] if ok.any() else lat
        p95f = float(np.percentile(lat_ok, 95))
        row = {
            "dur_s": dur,
            "cold_s": round(cold, 2),
            "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
            "p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1),
            "p95_ms_stall_filtered": round(p95f * 1e3, 1),
            "tunnel_rtt_ms": round(rtt_med * 1e3, 1),
            "stalled_samples": int((~ok).sum()),
            "rt_headroom": round(dur / float(np.percentile(lat, 95)), 2),
            "rt_headroom_stall_filtered": round(dur / p95f, 2),
        }
        if not args.stream:
            # 2-in-flight pipelined: per-buffer latency when the DAW
            # overlaps (order-dependent stream mode cannot pipeline)
            pipe = []
            for i in range(args.runs // 2):
                t0 = time.time()
                o1 = fused(make_buf(dur, seed=i),
                           rng=jax.random.PRNGKey(50 + i), **call_kw)
                o2 = fused(make_buf(dur, seed=-i),
                           rng=jax.random.PRNGKey(90 + i), **call_kw)
                _sync(o1)
                _sync(o2)
                pipe.append((time.time() - t0) / 2)
            row["pipe_p50_ms"] = round(
                float(np.percentile(np.array(pipe), 50)) * 1e3, 1)
        rows.append(row)
        log(f"| {dur:.2f}s buffer: cold {row['cold_s']}s, "
            f"p50 {row['p50_ms']}ms, p95 {row['p95_ms']}ms "
            f"({row['p95_ms_stall_filtered']}ms excl {row['stalled_samples']}"
            f" stalls, rtt {row['tunnel_rtt_ms']}ms), "
            + (f"pipelined p50 {row['pipe_p50_ms']}ms, "
               if "pipe_p50_ms" in row else "")
            + f"headroom {row['rt_headroom']}x/"
            f"{row['rt_headroom_stall_filtered']}x")

    # distinct compiled LENGTHS: plain keys are ints, shallow-diffusion
    # programs are keyed ('gt_mel', n44, step) (fused.py _get_fn)
    n_buckets = len({k if not isinstance(k, tuple) else k[1]
                     for k in fused._fns
                     if not isinstance(k, tuple) or k[0] == "gt_mel"})
    log(f"| compiled length buckets: {n_buckets} "
        f"(bucket = {BUCKET} samples = {BUCKET/SR:.3f}s)")
    rec = {"metric": "realtime_buffer_latency",
           "acc": SPEEDUP, "profile": args.profile,
           "bucket_samples": BUCKET,
           "n_buckets": n_buckets, "rows": rows}
    if args.stream:
        rec["stream"] = {"context_ms": args.stream_context_ms,
                         "crossfade_ms": args.stream_crossfade_ms}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
