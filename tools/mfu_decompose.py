"""Per-NFE device-time decomposition of the sampling dispatch (VERDICT r4 #2).

Reconciles the two published device-efficiency numbers:

- ``mfu_sampling_device_pct`` (bench.py, 26.8 in BENCH_r04): analytic matmul
  FLOPs over the RTT-subtracted time of bench's MODULAR diffusion dispatch —
  which runs **fp32**, and fp32 sampling deliberately keeps the XLA scan
  (ops/pallas/diffnet_stack.supported rejects esize != 2 because Mosaic's
  f32 dots are single-pass bf16). So 26.8% measures the fp32 XLA-scan
  quality-reference path, NOT the serving kernel.
- the ~73% kernel MFU (BASELINE.md r2): the bf16 Pallas residual-stack
  kernel alone, which is what the PRODUCTION (bf16, fused) sampling loop
  actually runs per NFE.

This tool times each level on the real chip with chained-scan dispatches
(N iterations inside ONE jit, so the ~25 ms tunnel RTT amortizes away):

  kernel_bf16   the Pallas residual-stack kernel alone        [T,C]->[T,C]
  step_bf16     full denoiser step (input proj + step MLP +
                stack + skip/output proj), the per-NFE body    [B,T,M]->[B,T,M]
  step_fp32     same step in fp32 = the XLA scan path
  loop_bf16     the complete sampling loop (PLMS, 50 NFE),
                bf16 denoiser — the fused headline's sampler
  loop_fp32     the complete fp32 sampling loop — what
                bench.py's modular ``diffusion`` leg times

and derives: sampler bookkeeping = loop/NFE - step; non-stack step
overhead = step - kernel.  MFU uses the same analytic FLOPs as bench.py
over 197 TFLOP/s (v5e single-pass bf16 peak; fp32 matmuls ALSO execute as
single-pass bf16 under default precision, so one peak is the right
denominator for both — the fp32 path loses to 2x activation bytes, not to
a slower MXU mode).

Writes runs/mfu_decompose/result.json and prints the table to stderr.
Usage: python tools/mfu_decompose.py [--iters 32] [--smoke]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=256,
                    help="chained kernel/step iterations inside one jit — "
                         "must put device time WELL above the tunnel-RTT "
                         "jitter (±5 ms): at 32 the kernel level measured "
                         "inside the noise floor and printed >100%% MFU")
    ap.add_argument("--loop-reps", type=int, default=8,
                    help="back-to-back async sampling-loop dispatches per "
                         "timed fetch (the CLAUDE.md K=8 protocol)")
    ap.add_argument("--rounds", type=int, default=4,
                    help="timed dispatches per measurement (min taken)")
    ap.add_argument("--out", default=None,
                    help="output dir (default runs/mfu_decompose; --smoke "
                         "defaults to runs/mfu_decompose_smoke so a CPU "
                         "smoke never clobbers the TPU artifact)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny dims on CPU: protocol check only")
    args = ap.parse_args()
    if args.out is None:
        args.out = ("runs/mfu_decompose_smoke" if args.smoke
                    else "runs/mfu_decompose")

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.models.diffusion import GaussianDiffusion
    from diffsvc_tpu.utils.rtt import make_rtt_probe

    dev = jax.devices()[0]
    log(f"| device: {dev}")
    rtt_probe = make_rtt_probe()

    # production bench dims (bench.py)
    SR, SECS, HOP, NFFT, NMEL = 44100, 10.0, 512, 2048, 128
    RES_CH, RES_L, HID = 384, 20, 256
    SPEEDUP = 20
    if args.smoke:
        RES_CH, RES_L = 128, 4
        SECS = 2.0
        args.iters = min(args.iters, 8)  # interpret-mode pallas is slow
    T_FRAMES = int(SR * SECS) // HOP + 1
    pad_T = -(-T_FRAMES // 128) * 128

    hp = HParams(
        audio_sample_rate=SR, audio_num_mel_bins=NMEL, fft_size=NFFT,
        hop_size=HOP, win_size=NFFT, fmin=40, fmax=16000, hidden_size=HID,
        residual_layers=RES_L, residual_channels=RES_CH,
        dilation_cycle_length=4, timesteps=1000, K_step=1000,
        diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=NMEL, spec_min=[-5.0], spec_max=[0.0], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=False, use_spk_id=False,
        use_spk_embed=False, use_uv=False, pitch_norm="log", f0_bin=256,
        f0_min=40.0, f0_max=1100.0, pndm_speedup=SPEEDUP)

    model = GaussianDiffusion(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    NFE = hp["K_step"] // SPEEDUP

    rng = np.random.RandomState(0)
    t_ph = max(pad_T // 2, 4)
    mel2ph = np.clip((np.arange(pad_T)[None] * t_ph // pad_T) + 1, 1,
                     t_ph).astype(np.int32)
    batch = {
        "hubert": jnp.asarray(rng.randn(1, t_ph, HID).astype(np.float32) * .1),
        "mel2ph": jnp.asarray(mel2ph),
        "f0": jnp.asarray(np.full((1, pad_T), np.log2(220.0), np.float32)),
        "uv": jnp.asarray(np.zeros((1, pad_T), np.float32)),
        "mels": jnp.asarray(rng.randn(1, pad_T, NMEL).astype(np.float32)),
    }

    # ---- timing helper: one jitted dispatch, tiny fetch, RTT-subtracted
    def timed(name, fn, fetch, n_units, rounds=None):
        rounds = rounds or args.rounds
        fetch(fn())  # compile
        best = float("inf")
        rtts = []
        for _ in range(rounds):
            r = rtt_probe()
            rtts.append(r)
            t0 = time.time()
            fetch(fn())
            wall = time.time() - t0
            best = min(best, max(wall - r, 1e-9))
        per = best / n_units
        log(f"| {name}: {best*1e3:.2f} ms device-est / {n_units} -> "
            f"{per*1e6:.0f} us/unit (rtt "
            + " ".join(f"{r*1e3:.0f}" for r in rtts) + " ms)")
        return per

    C, M, L, H = RES_CH, NMEL, RES_L, HID
    flops_kernel = 2 * pad_T * L * 8 * C * C                 # stack matmuls
    flops_step = 2 * pad_T * (M * C + L * 8 * C * C + C * C + C * M)
    cond_once = 2 * pad_T * L * H * 2 * C
    kind = str(getattr(dev, "device_kind", dev)).lower()
    peak = 275e12 if "v4" in kind else 197e12

    results = {"dims": {"T": pad_T, "C": C, "L": L, "M": M, "NFE": NFE},
               "peak_tflops": peak / 1e12,
               "flops": {"kernel_per_iter": flops_kernel,
                         "step_per_iter": flops_step,
                         "cond_once": cond_once}}

    from diffsvc_tpu.models import diffnet
    from diffsvc_tpu.ops.pallas import diffnet_stack as stack_mod

    interp = args.smoke  # CPU smoke runs the kernel in interpret mode
    cycle = 4
    kern_ok = (stack_mod.supported(L, cycle, pad_T, C, 1, esize=2)
               or args.smoke)

    # ---- level 1: the Pallas stack kernel alone, chained N times ----
    def cast16(t):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, t)

    dnp = params["denoise_fn"]
    wd = dnp["layers"]["dilated_conv"]["w"]
    bd = dnp["layers"]["dilated_conv"]["b"]
    wo = dnp["layers"]["output_projection"]["w"][:, 0]
    bo = dnp["layers"]["output_projection"]["b"]
    sb0 = jnp.asarray(rng.randn(L, C).astype(np.float32) * 0.1)
    cp0 = jnp.asarray(rng.randn(L, pad_T, 2 * C).astype(np.float32) * 0.1)
    x_tc = jnp.asarray(rng.randn(pad_T, C).astype(np.float32) * 0.3)

    if kern_ok:
        def kernel_chain(x0, sb, cp, wd_, bd_, wo_, bo_):
            def body(x, _):
                s = stack_mod.residual_stack(x, sb, cp, wd_, bd_, wo_, bo_,
                                             cycle=cycle, interpret=interp)
                return s.astype(x.dtype), None
            x, _ = jax.lax.scan(body, x0, None, length=args.iters)
            return x

        kfn = jax.jit(kernel_chain)
        a16 = [cast16(a) for a in (x_tc, sb0, cp0, wd, bd, wo, bo)]
        t_kernel = timed("kernel_bf16 (pallas stack)",
                         lambda: kfn(*a16),
                         lambda o: np.asarray(o[-2:, -2:]), args.iters)
        results["kernel_bf16_us"] = t_kernel * 1e6
        results["mfu_kernel_bf16_pct"] = round(
            100 * flops_kernel / t_kernel / peak, 1)
    else:
        log("| pallas kernel unsupported at these dims; skipping level 1")

    # ---- level 2: the full denoiser step (per-NFE body) ----
    cond = jnp.asarray(rng.randn(1, pad_T, HID).astype(np.float32) * 0.3)
    net_cfg = model.net_cfg
    tstep = jnp.full((1,), 500, jnp.int32)

    def step_chain_factory(as_bf16):
        def chain(x0, p, cpj):
            def body(x, _):
                out = diffnet.apply(p, net_cfg, x, tstep, cond_proj=cpj,
                                    inference=True)
                return out.astype(x.dtype), None
            x, _ = jax.lax.scan(body, x0, None, length=args.iters)
            return x
        return jax.jit(chain)

    x_btm = jnp.asarray(rng.randn(1, pad_T, NMEL).astype(np.float32) * 0.3)
    cproj = model._dec.prepare_cond(dnp, cond)
    sfn = step_chain_factory(True)
    t_step16 = timed("step_bf16 (full denoiser body)",
                     lambda: sfn(cast16(x_btm), cast16(dnp), cast16(cproj)),
                     lambda o: np.asarray(o[0, -1, -2:]), args.iters)
    t_step32 = timed("step_fp32 (XLA scan path)",
                     lambda: sfn(x_btm, dnp, cproj),
                     lambda o: np.asarray(o[0, -1, -2:]), args.iters)
    results["step_bf16_us"] = t_step16 * 1e6
    results["step_fp32_us"] = t_step32 * 1e6
    results["mfu_step_bf16_pct"] = round(100 * flops_step / t_step16 / peak, 1)
    results["mfu_step_fp32_pct"] = round(100 * flops_step / t_step32 / peak, 1)

    # ---- level 3: the complete sampling loops ----
    # one loop dispatch is only ~20-35 ms of device time — same order as
    # the RTT jitter — so dispatch --loop-reps of them back-to-back (async,
    # device executes serially) and fetch once: RTT amortizes 8x
    reps = max(args.loop_reps, 1)

    def rep_dispatch(fn):
        def go():
            out = None
            for _ in range(reps):
                out = fn()
            return out
        return go

    loop32 = jax.jit(lambda p, b, r: model.infer(p, b, r, speedup=SPEEDUP))
    t_loop32 = timed("loop_fp32 (bench's modular diffusion leg)",
                     rep_dispatch(
                         lambda: loop32(params, batch, jax.random.PRNGKey(3))),
                     lambda o: np.asarray(o["mel_out"][0, -1, -2:]),
                     NFE * reps)

    hp16 = dict(hp)
    hp16["diff_compute_dtype"] = "bfloat16"
    model16 = GaussianDiffusion(HParams(hp16))
    loop16 = jax.jit(lambda p, b, r: model16.infer(p, b, r, speedup=SPEEDUP))
    t_loop16 = timed("loop_bf16 (production sampling config)",
                     rep_dispatch(
                         lambda: loop16(params, batch, jax.random.PRNGKey(3))),
                     lambda o: np.asarray(o["mel_out"][0, -1, -2:]),
                     NFE * reps)
    results["loop_fp32_per_nfe_us"] = t_loop32 * 1e6
    results["loop_bf16_per_nfe_us"] = t_loop16 * 1e6
    results["mfu_loop_fp32_pct"] = round(100 * flops_step / t_loop32 / peak, 1)
    results["mfu_loop_bf16_pct"] = round(100 * flops_step / t_loop16 / peak, 1)

    # ---- level 4: the whole-ladder kernel (ops/pallas/plms_ladder.py):
    # every evaluation AND the PLMS update inside one pallas_call, x
    # resident in VMEM across the trajectory — the candidate answer to the
    # measured sampler-bookkeeping overhead. Also records its accuracy
    # against the bf16 scan and the fp32 quality reference.
    hp_lad = dict(hp16)
    hp_lad["sampler_pallas_ladder"] = "interpret" if args.smoke else "on"
    model_lad = GaussianDiffusion(HParams(**hp_lad))
    loop_lad = jax.jit(lambda p, b, r: model_lad.infer(p, b, r,
                                                       speedup=SPEEDUP))
    lad_reps = 1 if args.smoke else reps  # interpret mode is minutes/rep

    def lad_go():
        out = None
        for _ in range(lad_reps):
            out = loop_lad(params, batch, jax.random.PRNGKey(3))
        return out

    t_lad = timed("loop_ladder (whole-ladder pallas kernel)", lad_go,
                  lambda o: np.asarray(o["mel_out"][0, -1, -2:]),
                  NFE * lad_reps, rounds=1 if args.smoke else None)
    results["loop_ladder_per_nfe_us"] = t_lad * 1e6
    results["mfu_loop_ladder_pct"] = round(100 * flops_step / t_lad / peak, 1)
    o_lad = np.asarray(loop_lad(params, batch,
                                jax.random.PRNGKey(3))["mel_out"])
    o_16 = np.asarray(loop16(params, batch, jax.random.PRNGKey(3))["mel_out"])
    o_32 = np.asarray(loop32(params, batch, jax.random.PRNGKey(3))["mel_out"])
    results["ladder_vs_scan16_maxabs"] = float(np.abs(o_lad - o_16).max())
    results["ladder_vs_fp32_meanabs"] = float(np.abs(o_lad - o_32).mean())
    results["scan16_vs_fp32_meanabs"] = float(np.abs(o_16 - o_32).mean())
    log(f"| ladder accuracy: vs bf16 scan max|d| "
        f"{results['ladder_vs_scan16_maxabs']:.4f}; vs fp32 mean|d| "
        f"{results['ladder_vs_fp32_meanabs']:.4f} (bf16 scan itself: "
        f"{results['scan16_vs_fp32_meanabs']:.4f})")

    # ---- derived decomposition ----
    if "kernel_bf16_us" in results:
        results["step_minus_kernel_us"] = round(
            results["step_bf16_us"] - results["kernel_bf16_us"], 1)
    results["sampler_overhead_bf16_us"] = round(
        results["loop_bf16_per_nfe_us"] - results["step_bf16_us"], 1)
    results["sampler_overhead_fp32_us"] = round(
        results["loop_fp32_per_nfe_us"] - results["step_fp32_us"], 1)

    log("| ---- per-NFE device-time account (bf16 production path) ----")
    if "kernel_bf16_us" in results:
        log(f"|   pallas stack kernel: {results['kernel_bf16_us']:.0f} us "
            f"({results['mfu_kernel_bf16_pct']}% MFU of stack FLOPs)")
        log(f"|   + proj/stepMLP/skip: {results['step_minus_kernel_us']} us")
    log(f"|   = denoiser step:      {results['step_bf16_us']:.0f} us "
        f"({results['mfu_step_bf16_pct']}% MFU)")
    log(f"|   + sampler update/bookkeeping: "
        f"{results['sampler_overhead_bf16_us']} us")
    log(f"|   = loop per NFE:       {results['loop_bf16_per_nfe_us']:.0f} us "
        f"({results['mfu_loop_bf16_pct']}% MFU)")
    log(f"|   whole-ladder kernel:  {results['loop_ladder_per_nfe_us']:.0f}"
        f" us/NFE ({results['mfu_loop_ladder_pct']}% MFU)")
    log(f"| fp32 (quality-reference, = bench modular leg): step "
        f"{results['step_fp32_us']:.0f} us ({results['mfu_step_fp32_pct']}%)"
        f", loop/NFE {results['loop_fp32_per_nfe_us']:.0f} us "
        f"({results['mfu_loop_fp32_pct']}%)")

    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "result.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    log(f"| wrote {out_path}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
