"""Training-numerics A/B for the fused train kernel's stream dtype.

The batch-fused backward (ops/pallas/diffnet_stack.residual_stack_train_batched)
streams weights/conditioner/saved-activations as bf16 by default — matmul
operands are bf16-rounded by the MXU either way, so only the additive
conditioner term and the recomputed-gate rounding differ from f32 streams.
This tool provides the evidence that the difference does not move training:
it runs the SAME synthetic-singing-shaped step sequence (fixed seed, cycled
batches) at production dims under

  * pallas batched kernel, bf16 streams   (the shipped default)
  * pallas per-sample kernel, f32 streams (the legacy r3 path)
  * XLA scan                               (the fp32 reference)

and records the three loss curves.  Pass criterion (asserted): the
bf16-vs-scan terminal-loss gap is within 3x the f32-kernel-vs-scan gap
(i.e. stream rounding is in the same noise class as the kernel-vs-scan
reduction-order noise), and all curves decrease.

Usage: python tools/ab_train_stream.py [--smoke] [--steps 200]
Writes runs/ab_train_stream/result.json (smoke: runs/ab_train_stream_smoke).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        args.out = os.path.join(
            REPO, "runs/ab_train_stream_smoke" if args.smoke
            else "runs/ab_train_stream")

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

    B, T = args.batch, args.frames
    C, L, CYC, H, n_mel = 384, 20, 4, 256, 128
    steps = args.steps
    if args.smoke:
        B, T, C, L, CYC, n_mel, steps = 2, 256, 128, 4, 2, 16, 8

    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.training.task import SVCTask

    hp0 = dict(
        audio_num_mel_bins=n_mel, hidden_size=H, residual_layers=L,
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

    # synthetic singing-shaped batches: harmonic mel ridges that follow a
    # vibrato f0 line, hubert units as a content-correlated projection —
    # the loss has real structure, the comparison only needs determinism
    rng = np.random.RandomState(7)
    t_ph = T * 128 // 320
    n_batches = 4

    def make_batch(i):
        r = np.random.RandomState(100 + i)
        f0_hz = 220.0 * 2 ** (r.randn(B, 1) * 0.2 +
                              0.05 * np.sin(np.linspace(0, 12, T))[None, :])
        mel = np.zeros((B, T, n_mel), np.float32)
        bins = (np.log(f0_hz / 40.0) / np.log(1100.0 / 40.0) * n_mel)
        for k in range(1, 5):
            bk = np.clip(bins * k / 2, 0, n_mel - 1).astype(np.int32)
            for b in range(B):
                mel[b, np.arange(T), bk[b]] += 1.2 / k
        mel = mel * 2.0 - 4.0 + r.randn(B, T, n_mel).astype(np.float32) * 0.1
        mel2ph = np.clip((np.arange(T)[None, :] * t_ph // T) + 1, 1, t_ph
                         ).astype(np.int32) * np.ones((B, 1), np.int32)
        hub = r.randn(B, t_ph, H).astype(np.float32) * 0.1
        return {
            "hubert": jnp.asarray(hub),
            "mel2ph": jnp.asarray(mel2ph),
            "f0": jnp.asarray(np.log2(f0_hz) * np.ones((1, T))),
            "uv": jnp.zeros((B, T), jnp.float32),
            "energy": jnp.zeros((B, T), jnp.float32),
            "mels": jnp.asarray(mel),
        }

    batches = [make_batch(i) for i in range(n_batches)]

    modes = [
        ("batched_bf16", dict(diffnet_pallas_train=(
            "auto" if on_tpu else "interpret"),
            diffnet_train_stream_dtype="bf16")),
        ("kernel_f32", dict(diffnet_pallas_train=(
            "auto" if on_tpu else "interpret"),
            diffnet_train_stream_dtype="f32")),
        ("scan", dict(diffnet_pallas_train="off")),
    ]
    curves = {}
    for name, extra in modes:
        task = SVCTask(HParams(**dict(hp0, **extra)))
        state = task.init_state()
        losses = []
        t0 = time.time()
        for s in range(steps):
            key = jax.random.PRNGKey(s)  # same noise/t draws across modes
            state, m = task.train_step(state, dict(batches[s % n_batches]),
                                       key)
            losses.append(float(m["loss"]))
        wall = time.time() - t0
        curves[name] = losses
        log(f"| {name}: loss[0]={losses[0]:.5f} "
            f"loss[-5:]={[round(x, 5) for x in losses[-5:]]} "
            f"wall={wall:.0f}s ({wall / steps * 1e3:.1f} ms/step incl host)")

    tail = max(1, steps // 10)

    def tail_mean(n):
        return float(np.mean(curves[n][-tail:]))

    t_scan, t_f32, t_bf16 = (tail_mean("scan"), tail_mean("kernel_f32"),
                             tail_mean("batched_bf16"))
    gap_f32 = abs(t_f32 - t_scan)
    gap_bf16 = abs(t_bf16 - t_scan)
    rel_bf16 = gap_bf16 / max(t_scan, 1e-9)
    result = {
        "dims": {"B": B, "T": T, "C": C, "L": L, "steps": steps},
        "tail_mean_loss": {"scan": t_scan, "kernel_f32": t_f32,
                           "batched_bf16": t_bf16},
        "gap_vs_scan": {"kernel_f32": gap_f32, "batched_bf16": gap_bf16},
        "bf16_rel_gap": rel_bf16,
        "curves": curves,
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    log(f"| tail means: scan {t_scan:.5f}  f32-kernel {t_f32:.5f}  "
        f"bf16 {t_bf16:.5f}  (bf16 rel gap {rel_bf16:.2%})")

    for n in curves:
        head = float(np.mean(curves[n][:tail]))
        assert tail_mean(n) < head, (n, "loss did not decrease")
    # stream rounding must stay in the same noise class as the kernel's own
    # reduction-order noise vs the scan (3x headroom), or at most 1% of the
    # loss scale — whichever is looser
    assert gap_bf16 <= max(3 * gap_f32, 0.01 * t_scan), result["gap_vs_scan"]
    log("| AB PASS")
    print(json.dumps({k: v for k, v in result.items() if k != "curves"}))


if __name__ == "__main__":
    main()
