"""Real-chip training demo for the iSTFT-head vocoder family.

Round-3 companion to tools/train_demo_tpu.py (which proves the diffusion
trainer): this proves the TPU-first vocoder family LEARNS — the full
GAN+mel recipe of training/vocoder_task.py (MPD+MSD discriminators,
feature-matching, L1 mel) at production 44.1 kHz dims on the actual TPU,
with a decreasing loss curve, checkpoint save/reload through the
IstftVocoder registry wrapper, and before/after audio artifacts.

Dataset: synthetic singing (harmonic voices with vibrato + phrasing, the
train_demo_tpu.py recipe); f0 is taken from the analytic curve on the mel
frame grid, so the f0-embedding path trains on exact pitch.

Writes runs/tpu_istft_train/summary.json with the loss curves, steps/s,
and the held-out mel-L1 before vs after training.

Usage: python tools/train_istft_tpu.py [--steps 400] [--cpu-smoke]
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


def make_clips(sr, n_clips, dur, hop, n_mels, nfft, win, fmin, fmax):
    """Synthetic singing + canonical NSF mel + analytic f0 on the mel grid."""
    import jax.numpy as jnp
    import numpy as np

    from diffsvc_tpu.ops import mel as mel_ops

    rng = np.random.RandomState(0)
    notes = [196.0, 220.0, 247.0, 262.0, 294.0, 330.0, 349.0, 392.0]
    clips = []
    for i in range(n_clips):
        t = np.arange(int(sr * dur)) / sr
        f0c = notes[i % len(notes)] * 2 ** (
            0.04 * np.sin(2 * np.pi * (4.5 + 0.3 * i) * t)
            + 0.2 * np.sin(2 * np.pi * 0.4 * t + i))
        ph = np.cumsum(2 * np.pi * f0c / sr)
        wav = (0.35 * np.sin(ph) + 0.2 * np.sin(2 * ph)
               + 0.1 * np.sin(3 * ph) + 0.01 * rng.randn(len(t)))
        env = 0.5 + 0.5 * np.sin(2 * np.pi * 0.8 * t + i)
        wav = (wav * env).astype(np.float32)
        mel = np.asarray(mel_ops.wav2mel_nsf(
            jnp.asarray(wav), sr=sr, n_fft=nfft, hop=hop, win_length=win,
            n_mels=n_mels, fmin=fmin, fmax=fmax))
        # analytic f0 at frame centers (zero where the phrasing env gates)
        centers = np.arange(mel.shape[0]) * hop
        centers = np.clip(centers, 0, len(t) - 1)
        f0_frames = f0c[centers].astype(np.float32)
        clips.append({"wav": wav, "mel": mel, "f0": f0_frames})
    return clips


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--segment-frames", type=int, default=32)
    ap.add_argument("--log-interval", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(REPO, "runs/tpu_istft_train"))
    ap.add_argument("--cpu-smoke", action="store_true",
                    help="tiny dims on CPU for a fast correctness pass")
    args = ap.parse_args()

    from diffsvc_tpu.utils.compile_cache import enable as _cc

    _cc()
    import jax

    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.training.vocoder_task import VocoderTask, crop_batch
    from diffsvc_tpu.vocoders import istft_head as ih

    log(f"devices: {jax.devices()}")
    os.makedirs(args.out, exist_ok=True)

    if args.cpu_smoke:
        sr, hop, nfft, win, nmel, dim, layers, dur, nclips = (
            8000, 64, 256, 256, 16, 64, 2, 1.0, 4)
    else:
        sr, hop, nfft, win, nmel, dim, layers, dur, nclips = (
            44100, 512, 2048, 2048, 128, 512, 8, 2.0, 8)

    hp = HParams(
        audio_sample_rate=sr, hop_size=hop, fft_size=nfft, win_size=win,
        audio_num_mel_bins=nmel, fmin=40, fmax=16000 if sr > 16000 else 3500,
        vocoder="istftvocoder", use_nsf=True,
        istft_dim=dim, istft_layers=layers,
        vocoder_lr=2e-4, lambda_mel=45.0, seed=1234)

    clips = make_clips(sr, nclips, dur, hop, nmel, nfft, win,
                       float(hp["fmin"]), float(hp["fmax"]))
    held_out, train_clips = clips[0], clips[1:]
    log(f"clips: {len(train_clips)} train + 1 held-out, "
        f"{clips[0]['mel'].shape[0]} frames each")

    task = VocoderTask(hp)
    state = task.init_state()
    rng_np = np.random.RandomState(0)
    rng = jax.random.PRNGKey(0)

    def held_out_mel_l1(g_params):
        """Render the full held-out clip and measure mel L1 (device)."""
        m = jnp.asarray(held_out["mel"])[None]
        f = jnp.asarray(held_out["f0"])[None]
        y_hat = ih.apply(g_params, task.icfg, m, f)
        mel_hat = task._mel_for_loss(y_hat)
        n = min(mel_hat.shape[1], m.shape[1])   # guard; both are NSF-mel now
        return jnp.abs(mel_hat[:, :n] - m[:, :n]).mean(), y_hat[0]

    held_fn = jax.jit(held_out_mel_l1)

    l1_before, wav_before = held_fn(state["g_params"])
    l1_before = float(l1_before)
    log(f"held-out mel L1 before training: {l1_before:.4f}")

    # --- training loop -----------------------------------------------------
    curve = []                      # (step, metrics dict of device scalars)
    t_compile0 = time.time()
    picks = [train_clips[rng_np.randint(len(train_clips))]
             for _ in range(args.batch)]
    batch = crop_batch(picks, hp, rng_np, segment_frames=args.segment_frames)
    state, metrics = task.train_step(state, batch, jax.random.fold_in(rng, 0))
    jax.block_until_ready(metrics["g_loss"])
    compile_s = time.time() - t_compile0
    log(f"step compile+first: {compile_s:.1f}s")
    curve.append((1, {k: v for k, v in metrics.items()}))

    t0 = time.time()
    for step in range(2, args.steps + 1):
        picks = [train_clips[rng_np.randint(len(train_clips))]
                 for _ in range(args.batch)]
        batch = crop_batch(picks, hp, rng_np,
                           segment_frames=args.segment_frames)
        state, metrics = task.train_step(state, batch,
                                         jax.random.fold_in(rng, step))
        if step % args.log_interval == 0 or step == args.steps:
            curve.append((step, metrics))
            g = float(metrics["g_loss"])    # sync point, every log-interval
            log(f"| step {step}: g_loss {g:.3f} "
                f"d_loss {float(metrics['d_loss']):.3f} "
                f"mel {float(metrics['g_mel']):.4f}")
    jax.block_until_ready(state["g_params"])
    train_s = time.time() - t0
    steps_s = (args.steps - 1) / train_s
    log(f"{args.steps - 1} steps in {train_s:.1f}s = {steps_s:.2f} steps/s")

    l1_after, wav_after = held_fn(state["g_params"])
    l1_after = float(l1_after)
    log(f"held-out mel L1 after: {l1_after:.4f} (before {l1_before:.4f})")

    # --- checkpoint save + reload through the registry wrapper -------------
    ckpt_path = os.path.join(args.out, "istft_g.npz")
    ih.save_params(ckpt_path, state["g_params"])
    hp2 = hp.copy()
    hp2["vocoder_ckpt"] = ckpt_path
    wrapper = ih.IstftVocoder(hp2)
    # params must round-trip EXACTLY; the rendered waveforms are compared
    # with a tolerance because wrapper.spec2wav jits its own graph, and on
    # TPU the default-precision f32 matmul is a single bf16 pass (~8
    # mantissa bits), so two fusions of the same math differ ~5e-3·rms
    # (measured 4.9e-3 on the 400-step run; bit-identical on CPU).
    params_exact = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state["g_params"]),
                        jax.tree_util.tree_leaves(wrapper.params)))
    wav_wrap = wrapper.spec2wav(held_out["mel"], f0=held_out["f0"])
    ref = np.asarray(wav_after)
    render_max_diff = float(np.abs(wav_wrap - ref).max())
    render_rms = float(np.sqrt(np.mean(ref ** 2)))
    reload_ok = bool(params_exact
                     and render_max_diff < max(2e-2 * render_rms, 1e-5))
    log(f"wrapper reload: params exact {params_exact}, render max|d| "
        f"{render_max_diff:.2e} (rms {render_rms:.3f}) -> ok {reload_ok}")

    from diffsvc_tpu.utils.audio_io import save_wav

    save_wav(np.asarray(wav_before), os.path.join(args.out, "before.wav"), sr)
    save_wav(np.asarray(wav_after), os.path.join(args.out, "after.wav"), sr)
    save_wav(held_out["wav"], os.path.join(args.out, "target.wav"), sr)

    summary = {
        "device": str(jax.devices()[0]),
        "dims": {"sr": sr, "hop": hop, "n_fft": nfft, "n_mels": nmel,
                 "dim": dim, "layers": layers, "batch": args.batch,
                 "segment_frames": args.segment_frames},
        "compile_s": round(compile_s, 1),
        "steps": args.steps,
        "steps_per_s": round(steps_s, 3),
        "ms_per_step": round(1000.0 / steps_s, 1),
        "loss_curve": [
            {"step": s, **{k: round(float(v), 4) for k, v in m.items()}}
            for s, m in curve],
        "held_out_mel_l1": {"before": round(l1_before, 4),
                            "after": round(l1_after, 4)},
        "ckpt": ckpt_path,
        "wrapper_reload": {"ok": reload_ok, "params_exact": params_exact,
                           "render_max_abs_diff": render_max_diff,
                           "render_rms": render_rms},
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    log(f"summary -> {args.out}/summary.json")
    improved = l1_after < l1_before * 0.7
    g_first = float(curve[0][1]["g_mel"])
    g_last = float(curve[-1][1]["g_mel"])
    log(f"train mel L1 first->last: {g_first:.4f} -> {g_last:.4f}")
    print(json.dumps({"ok": bool(improved), "l1_before": l1_before,
                      "l1_after": l1_after, "steps_per_s": steps_s}))


if __name__ == "__main__":
    main()
