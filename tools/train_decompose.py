"""Where does the training step's time go? Per-leg device timing on TPU.

The round-3 record (BASELINE.md): fused fwd+bwd DiffNet kernel
(residual_stack_train) 65.2 ms/step vs 77.7 ms XLA scan at production dims
(B=24, T=1024, C=384, L=20). Analytically the matmuls are ~3x the forward's
~1.2 TFLOP ~= 3.5 TFLOP -> 18 ms at the 197 TF/s bf16 peak, so the step runs
at ~27% MFU while the serving sampling kernel reaches 77%. This tool splits
the step into device-timed legs so the gap is attributable:

  1. train_step (pallas auto)     — the shipped config
  2. train_step (pallas off)      — the XLA scan baseline
  3. grad(stack) pallas           — vmapped residual_stack_train fwd+bwd
                                    INCLUDING the XLA batch-sum of the
                                    per-sample weight grads the bwd kernel
                                    emits ([B,L,3,C,2C] etc.)
  4. grad(stack) scan             — same loss through the XLA scan stack
  5. stack fwd only (infer krnl)  — vmapped residual_stack
  6. stack fwd only (train krnl)  — _call_fwd with the [L,T,C] xsave emission

Timing protocol (CLAUDE.md): K async dispatches chained on a tiny carry +
one small fetch; report the MINIMUM round (tunnel load varies); legs timed
in the same process back-to-back.

Usage: python tools/train_decompose.py [--smoke] [--out runs/train_decompose]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, args, fetch, rtt_probe, k1=2, k2=10, rounds=5):
    """Two-point slope device estimate.  A k-dispatch chain's wall clock is
    (tunnel overhead) + k * device_time with the overhead's split between
    per-chain RTT and per-dispatch cost unknown a priori — so time chains
    of k1 and k2 dispatches and take the slope
    (minT(k2) - minT(k1)) / (k2 - k1), which cancels every k-independent
    term.  Returns (wall_per_dispatch_at_k2, slope_device_estimate)."""
    import numpy as np

    def chain(k):
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(k):
                out = fn(*args)
            np.asarray(fetch(out))  # tiny fetch drains the chain
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = chain(k1)
    t2 = chain(k2)
    dev = max((t2 - t1) / (k2 - k1), 1e-9)
    return t2 / k2, dev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny dims on CPU")
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--frames", type=int, default=1024)
    args = ap.parse_args()
    if args.out is None:
        args.out = os.path.join(
            REPO, "runs/train_decompose_smoke" if args.smoke
            else "runs/train_decompose")

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from diffsvc_tpu.utils.compile_cache import enable as _cc

    _cc()
    import jax
    import jax.numpy as jnp
    import numpy as np

    log(f"| device: {jax.devices()[0]}")
    on_tpu = jax.default_backend() == "tpu"

    from diffsvc_tpu.utils.rtt import make_rtt_probe

    rtt_probe = make_rtt_probe()
    rtt0 = sorted(rtt_probe() for _ in range(5))[2]
    log(f"| no-op dispatch RTT (median of 5): {rtt0 * 1e3:.1f} ms")

    B, T = args.batch, args.frames
    C, L, CYC, H = 384, 20, 4, 256
    if args.smoke:
        B, T, C, L, CYC = 2, 256, 128, 4, 2

    rng = np.random.RandomState(0)

    def f32(*shape, scale=0.05):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)

    x0 = f32(B, T, C, scale=1.0)
    sb = f32(L, B, C)
    cond = f32(L, B, T, 2 * C)
    wd = f32(L, 3, C, 2 * C)
    bd = f32(L, 2 * C)
    wo = f32(L, C, 2 * C)
    bo = f32(L, 2 * C)
    dout = f32(B, T, C, scale=1.0)

    from diffsvc_tpu.ops.pallas import diffnet_stack as stack

    interp = not on_tpu
    results = {}

    # analytic FLOPs: per layer 3 dilated dots (T x C x 2C each) + the
    # output projection (T x C x 2C); fwd+bwd is 3x (dgrad + wgrad)
    per_layer = 4 * (2 * T * C * 2 * C)
    fwd_flops = B * L * per_layer
    train_flops = 3 * fwd_flops
    peak = 197e12 if on_tpu else 1e12

    def vstack(fn):
        def run(x, s, cp, *w):
            return jax.vmap(lambda x1, s1, c1: fn(x1, s1, c1, *w),
                            in_axes=(0, 1, 1))(x, s, cp)

        return run

    # --- leg 5: fwd only, inference kernel
    @jax.jit
    def fwd_infer(x, s, cp, wd_, bd_, wo_, bo_):
        return vstack(functools.partial(stack.residual_stack, cycle=CYC,
                                        interpret=interp))(
            x, s, cp, wd_, bd_, wo_, bo_)

    # --- leg 6: fwd only, train kernel (emits the [L,T,C] residual stack)
    @jax.jit
    def fwd_train(x, s, cp, wd_, bd_, wo_, bo_):
        out, xsave = jax.vmap(
            lambda x1, s1, c1: stack._call_fwd(
                x1, s1, c1, wd_, bd_, wo_, bo_, cycle=CYC, interpret=interp),
            in_axes=(0, 1, 1))(x, s, cp)
        return out, xsave

    # --- legs 3/4: fwd+bwd of the stack alone (loss = <dout, out>)
    def make_grad(core):
        def loss(xx, ss, cp, wd_, bd_, wo_, bo_):
            out = vstack(core)(xx, ss, cp, wd_, bd_, wo_, bo_)
            return jnp.vdot(out, dout)

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6)))

    grad_pallas = make_grad(
        lambda x1, s1, c1, wd_, bd_, wo_, bo_: stack.residual_stack_train(
            x1, s1, c1, wd_, bd_, wo_, bo_, CYC, interp))

    # batched train kernel (one fused backward over the whole batch)
    def make_grad_batched(sd):
        def loss(xx, ss, cp, wd_, bd_, wo_, bo_):
            out = stack.residual_stack_train_batched(
                xx, ss, cp, wd_, bd_, wo_, bo_, CYC, interp, sd)
            return jnp.vdot(out, dout)

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6)))

    def scan_core(x1, sb1, cp1, wd_, bd_, wo_, bo_):
        # the XLA-scan residual stack at matched semantics (per sample),
        # hand-rolled with lax.scan over layers (dn.apply's scan path
        # carries the fs2/embedding glue this leg deliberately excludes)
        import math

        def layer(x, inp):
            sb_l, cp_l, wd_l, bd_l, wo_l, bo_l, dil = inp
            y = x + sb_l[None, :]
            T_ = y.shape[0]

            def tap(d):
                yl = jnp.roll(y, d, axis=0).at[:d].set(0.0)
                yr = jnp.roll(y, -d, axis=0).at[T_ - d:].set(0.0)
                return yl, yr

            yl, yr = jax.lax.switch(dil, [lambda d=2 ** j: tap(d)
                                          for j in range(CYC)])
            z = (yl @ wd_l[0] + y @ wd_l[1] + yr @ wd_l[2]
                 + bd_l[None, :] + cp_l)
            h = jax.nn.sigmoid(z[:, :C]) * jnp.tanh(z[:, C:])
            o = h @ wo_l + bo_l[None, :]
            x = (x + o[:, :C]) * (1.0 / math.sqrt(2.0))
            return x, o[:, C:]

        dil = jnp.arange(L, dtype=jnp.int32) % CYC
        _, skips = jax.lax.scan(layer, x1, (sb1, cp1, wd_, bd_, wo_, bo_, dil))
        return skips.sum(0)

    grad_scan = make_grad(scan_core)

    # fwd with bf16 streams (the batched-VJP forward): isolates the
    # stream-dtype effect on the per-step efficiency
    @jax.jit
    def fwd_bf16(x, s, cp, wd_, bd_, wo_, bo_):
        return stack.residual_stack_train_batched(
            x, s, cp, wd_, bd_, wo_, bo_, CYC, interp, "bf16")

    # ALL-bf16 fwd (x-state bf16 like the serving kernel), inputs
    # pre-converted OUTSIDE the jit so conversion cost is excluded:
    # isolates the VPU-elementwise-width hypothesis for the 37%-vs-73%
    # train/serving kernel gap
    bf = jnp.bfloat16
    x0h, sbh, condh = x0.astype(bf), sb.astype(bf), cond.astype(bf)
    wdh, woh = wd.astype(bf), wo.astype(bf)

    @jax.jit
    def fwd_allbf16(x, s, cp, wd_, bd_, wo_, bo_):
        return vstack(functools.partial(stack.residual_stack, cycle=CYC,
                                        interpret=interp))(
            x, s, cp, wd_, bd_, wo_, bo_)

    # raw batched backward alone (random saved activations): splits the
    # grad legs into their fwd/bwd parts; bf16 operands pre-converted
    xsave_b = jnp.asarray(
        rng.randn(B, L, T, C).astype(np.float32) * 0.3).astype(jnp.bfloat16)

    @jax.jit
    def bwd_raw_pre(xs, s, cp, wd_, bd_, wo_, bo_, do_):
        return stack._call_bwd_batched(xs, s, cp, wd_, bd_, wo_, bo_, do_,
                                       cycle=CYC, interpret=interp)

    @jax.jit
    def bwd_raw(xs, s, cp, wd_, bd_, wo_, bo_, do_):
        return stack._call_bwd_batched(
            xs, s, cp.astype(jnp.bfloat16), wd_.astype(jnp.bfloat16), bd_,
            wo_.astype(jnp.bfloat16), bo_, do_.astype(jnp.bfloat16),
            cycle=CYC, interpret=interp)

    # bwd FLOPs include the z/gate recompute: 3 recompute dots + dwo + dh
    # + 3 dwd + 3 dy = 11 dots of 2*T*C*2C each per (layer, sample)
    bwd_flops = B * L * 11 * (2 * T * C * 2 * C)

    legs = [
        ("stack_fwd_infer_kernel", fwd_infer, (x0, sb, cond, wd, bd, wo, bo),
         lambda o: o[0, :2, :2], fwd_flops),
        ("stack_fwd_train_kernel", fwd_train, (x0, sb, cond, wd, bd, wo, bo),
         lambda o: o[0][0, :2, :2], fwd_flops),
        ("stack_fwd_bf16_stream", fwd_bf16, (x0, sb, cond, wd, bd, wo, bo),
         lambda o: o[0, :2, :2], fwd_flops),
        ("stack_fwd_allbf16", fwd_allbf16,
         (x0h, sbh, condh, wdh, bd, woh, bo),
         lambda o: o[0, :2, :2], fwd_flops),
        ("stack_bwd_batched_raw", bwd_raw,
         (xsave_b, sb, cond, wd, bd, wo, bo, dout),
         lambda o: o[0][0, :2, :2], bwd_flops),
        ("stack_bwd_batched_preconv", bwd_raw_pre,
         (xsave_b, sb, condh, wdh, bd, woh, bo, dout.astype(bf)),
         lambda o: o[0][0, :2, :2], bwd_flops),
        ("stack_grad_pallas", grad_pallas, (x0, sb, cond, wd, bd, wo, bo),
         lambda o: o[0][0, :2, :2], train_flops),
        ("stack_grad_batched_bf16", make_grad_batched("bf16"),
         (x0, sb, cond, wd, bd, wo, bo),
         lambda o: o[0][0, :2, :2], train_flops),
        ("stack_grad_scan", grad_scan, (x0, sb, cond, wd, bd, wo, bo),
         lambda o: o[0][0, :2, :2], train_flops),
    ]
    for name, fn, a, fetch, flops in legs:
        try:
            t0 = time.time()
            out = fn(*a)
            jax.block_until_ready(fetch(out))
            log(f"| compile {name}: {time.time() - t0:.1f}s")
            dt_wall, dt = time_fn(fn, a, fetch, rtt_probe)
        except Exception as e:  # keep the sweep alive on a leg failure
            log(f"| {name}: FAILED ({type(e).__name__}: {str(e)[:200]})")
            results[name] = {"error": str(e)[:500]}
            continue
        mfu = flops / dt / peak * 100
        results[name] = {"ms": round(dt * 1e3, 2),
                         "ms_wall": round(dt_wall * 1e3, 2),
                         "mfu_pct": round(mfu, 1)}
        log(f"| {name}: {dt * 1e3:.2f} ms device-est "
            f"({dt_wall * 1e3:.2f} wall)  ({mfu:.1f}% MFU)")

    # --- REAL-HARDWARE numerics check: the batched kernel's revisited-
    # output accumulation + dynamic-index dx carry have no interpret-mode
    # analog of Mosaic's flush ordering — compare every gradient against
    # the XLA scan on-device (bf16 stream tolerance)
    try:
        gk = make_grad_batched("bf16")(x0, sb, cond, wd, bd, wo, bo)
        gr = grad_scan(x0, sb, cond, wd, bd, wo, bo)
        names = ["dx0", "dsb", "dcp", "dwd", "dbd", "dwo", "dbo"]
        parity = {}
        worst = 0.0
        for n, a_, b_ in zip(names, gk, gr):
            a_, b_ = np.asarray(a_), np.asarray(b_)
            rel = float(np.max(np.abs(a_ - b_)) / (np.max(np.abs(b_)) + 1e-9))
            parity[n] = round(rel, 6)
            worst = max(worst, rel)
        results["parity_batched_vs_scan_relmax"] = parity
        ok = worst < 2e-2
        log(f"| on-device grad parity batched-bf16 vs scan: relmax "
            f"{parity} -> {'OK' if ok else 'FAIL'}")
        if not ok:
            results["parity_FAIL"] = True
    except Exception as e:
        log(f"| parity check failed to run: {e}")
        results["parity_error"] = str(e)[:300]

    # --- legs 1/2: the full SVC train step, pallas auto vs off
    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.training.task import SVCTask

    n_mel, hidden = (128, H) if not args.smoke else (16, H)
    hp0 = dict(
        audio_num_mel_bins=n_mel, hidden_size=hidden, residual_layers=L,
        residual_channels=C, dilation_cycle_length=CYC, timesteps=1000,
        K_step=1000, diff_loss_type="l2", schedule_type="linear",
        max_beta=0.02, keep_bins=n_mel, spec_min=[-5.0], spec_max=[0.0],
        no_fs2=True, use_pitch_embed=True, use_energy_embed=False,
        use_spk_id=False, use_spk_embed=False, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=40.0, f0_max=1100.0, lr=4e-4,
        scheduler="step_lr", decay_steps=40000, optimizer_adam_beta1=0.9,
        optimizer_adam_beta2=0.98, weight_decay=0, clip_grad_norm=1,
        accumulate_grad_batches=1, seed=1234,
    )
    t_ph = T * 128 // 320
    mel2ph = np.clip((np.arange(T)[None, :] * t_ph // T) + 1, 1, t_ph
                     ).astype(np.int32) * np.ones((B, 1), np.int32)
    batch = {
        "hubert": jnp.asarray(
            rng.randn(B, t_ph, hidden).astype(np.float32) * 0.1),
        "mel2ph": jnp.asarray(mel2ph),
        "f0": jnp.full((B, T), np.log2(220.0), jnp.float32),
        "uv": jnp.zeros((B, T), jnp.float32),
        "energy": jnp.zeros((B, T), jnp.float32),
        "mels": jnp.asarray(rng.randn(B, T, n_mel).astype(np.float32)),
    }
    key = jax.random.PRNGKey(0)
    for mode, name in ((("interpret" if not on_tpu else "auto"),
                        "train_step_pallas"),
                       ("off", "train_step_scan")):
        try:
            task = SVCTask(HParams(**dict(hp0, diffnet_pallas_train=mode)))
            state = task.init_state()
            t0 = time.time()
            for _ in range(2):
                state, metrics = task.train_step(state, dict(batch), key)
            jax.block_until_ready(metrics["loss"])
            log(f"| compile {name}: {time.time() - t0:.1f}s")

            # two-point slope, same protocol as time_fn (state is DONATED
            # into the step — always thread it)
            def step_chain(k):
                nonlocal state
                best = float("inf")
                for _ in range(5):
                    t0 = time.perf_counter()
                    for _ in range(k):
                        state, m = task.train_step(state, dict(batch), key)
                    np.asarray(m["loss"])
                    best = min(best, time.perf_counter() - t0)
                return best

            t1c, t2c = step_chain(2), step_chain(10)
            best_wall = t2c / 10
            best = max((t2c - t1c) / 8, 1e-9)
        except Exception as e:
            log(f"| {name}: FAILED ({type(e).__name__}: {str(e)[:200]})")
            results[name] = {"error": str(e)[:500]}
            continue
        mfu = train_flops / best / peak * 100
        results[name] = {"ms": round(best * 1e3, 2),
                         "ms_wall": round(best_wall * 1e3, 2),
                         "mfu_pct_stack_only": round(mfu, 1)}
        log(f"| {name}: {best * 1e3:.2f} ms device-est "
            f"({best_wall * 1e3:.2f} wall)  "
            f"({mfu:.1f}% MFU counting stack matmuls only)")

    os.makedirs(args.out, exist_ok=True)
    payload = {
        "dims": {"B": B, "T": T, "C": C, "L": L, "cycle": CYC},
        "flops": {"stack_fwd": fwd_flops, "stack_train": train_flops},
        "peak_tflops": peak / 1e12,
        "legs": results,
    }
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(payload, f, indent=1)
    log(f"| wrote {args.out}/result.json")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
