"""Training-step throughput experiment: matmul/conv precision modes on TPU.

Times the full jitted SVC train step (fwd+bwd+AdamW) at production 44.1 kHz
dims (reference `training/config_nsf.yaml`: residual 384x20, hidden 256,
128 mel) under different `jax.default_matmul_precision` settings, to pick
the default for `mixed_precision` training. Logs go to stderr; a summary
JSON line per variant goes to stdout.

Usage: python tools/bench_train.py [--batch 24] [--frames 1024] [--steps 10]
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
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--channels", type=int, default=384)
    ap.add_argument("--layers", type=int, default=20)
    ap.add_argument("--cpu", action="store_true", help="smoke-test on CPU")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffsvc_tpu.utils.compile_cache import enable as _cc
    _cc()
    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.training.task import SVCTask

    log(f"| device: {jax.devices()[0]}")
    B, T = args.batch, args.frames
    n_mel, hidden = 128, 256

    hp = HParams(
        audio_num_mel_bins=n_mel, hidden_size=hidden,
        residual_layers=args.layers, residual_channels=args.channels,
        dilation_cycle_length=4, timesteps=1000, K_step=1000,
        diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=n_mel, spec_min=[-5.0], spec_max=[0.0], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=False, use_spk_id=False,
        use_spk_embed=False, use_uv=False, pitch_norm="log", f0_bin=256,
        f0_min=40.0, f0_max=1100.0, lr=4e-4, scheduler="step_lr",
        decay_steps=40000, optimizer_adam_beta1=0.9,
        optimizer_adam_beta2=0.98, weight_decay=0, clip_grad_norm=1,
        accumulate_grad_batches=1, seed=1234,
    )

    rng = np.random.RandomState(0)
    t_ph = T * 128 // 320  # hubert units at uniform stretch
    mel2ph = np.clip((np.arange(T)[None, :] * t_ph // T) + 1, 1, t_ph
                     ).astype(np.int32) * np.ones((B, 1), np.int32)
    batch = {
        "hubert": rng.randn(B, t_ph, hidden).astype(np.float32) * 0.1,
        "mel2ph": mel2ph,
        "f0": np.full((B, T), np.log2(220.0), np.float32),
        "uv": np.zeros((B, T), np.float32),
        "energy": np.zeros((B, T), np.float32),
        "mels": rng.randn(B, T, n_mel).astype(np.float32),
    }

    import jax.numpy as jnp

    # stage the batch on device once — we are measuring the train-step
    # compute, not host->device transfer (which training pipelines overlap)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    variants = [("bfloat16", hp), ("BF16_BF16_F32_X3", hp), ("highest", hp),
                ("bfloat16+pallas_train",
                 HParams(**dict(hp, diffnet_pallas_train="on")))]
    for precision, hp_v in variants:
        with jax.default_matmul_precision(precision.split("+")[0]):
            task = SVCTask(hp_v)
            state = task.init_state()
            key = jax.random.PRNGKey(0)
            # warmup (compile + 2 steps)
            for i in range(3):
                state, metrics = task.train_step(state, dict(dev_batch), key)
            jax.block_until_ready(metrics["loss"])
            t0 = time.perf_counter()
            for i in range(args.steps):
                state, metrics = task.train_step(state, dict(dev_batch), key)
            jax.block_until_ready(metrics["loss"])
            dt = (time.perf_counter() - t0) / args.steps
        loss = float(metrics["loss"])
        fps = B * T / dt
        rec = {"precision": precision, "ms_per_step": round(dt * 1e3, 2),
               "mel_frames_per_s": round(fps), "loss": round(loss, 4)}
        log(f"| {rec}")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
