"""iSTFT-head vs NSF-HiFiGAN vocoder A/B at production dims (VERDICT r3 #3).

Round 3 built the iSTFT-head family as the architected escape from the
MXU pass-bound conv-tail floor (BASELINE.md r3) and measured its RTF, but
its quality story was a 400-step demo with no baseline.  This tool trains
BOTH families with the IDENTICAL GAN+mel recipe (training/vocoder_task.py:
MPD+MSD, feature matching, lambda_mel=45 L1 — the openvpi NSF-HiFiGAN
recipe, ref modules/nsf_hifigan/models.py:325-396 as the quality bar) on
the SAME clips, same seeds, same crop schedule, then scores the held-out
clip with mel-L1 AND multi-resolution STFT loss and writes before/after
audio for each.

Outputs runs/vocoder_ab/: summary.json, {istft,nsf}_{before,after}.wav,
target.wav.  The quality-vs-RTF decision for config_44k_fast is made in
BASELINE.md from this summary + the bench rtf_istft_voc ride-along.

Usage: python tools/ab_vocoder_tpu.py [--steps 1500] [--cpu-smoke]
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


def make_real_clips(path, sr, dur, hop, nmel, nfft, win, fmin, fmax):
    """Real-recording clips in the make_clips format: load a vocal wav,
    resample to the profile rate, cut into non-overlapping ``dur``-second
    windows, mel via the canonical NSF wav2spec and f0 via the in-repo AC
    tracker (the same features the binarizer would produce)."""
    import jax.numpy as jnp
    import numpy as np
    from scipy.io import wavfile

    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.ops import mel as mel_ops
    from diffsvc_tpu.ops.f0_ac import get_pitch_ac
    from diffsvc_tpu.utils.audio_io import resample

    sr0, w = wavfile.read(path)
    if w.ndim > 1:
        w = w.mean(-1)
    if np.issubdtype(w.dtype, np.integer):
        # iinfo.max (32767 for int16), matching FusedSvc.to_float and the
        # on-device PCM16 decode — not max+1 (1-LSB scale mismatch)
        w = w.astype(np.float32) / float(np.iinfo(w.dtype).max)
    if sr0 != sr:
        w = resample(w.astype(np.float32), sr0, sr)
    hp_f0 = HParams(audio_sample_rate=sr, hop_size=hop, f0_min=40.0,
                    f0_max=1100.0, f0_bin=256, wav_bucket_frames=1)
    n = int(sr * dur)
    clips = []
    for s in range(0, len(w) - n + 1, n):
        wav = np.asarray(w[s:s + n], np.float32)
        mel = np.asarray(mel_ops.wav2mel_nsf(
            jnp.asarray(wav), sr=sr, n_fft=nfft, hop=hop, win_length=win,
            n_mels=nmel, fmin=fmin, fmax=fmax))
        f0, _ = get_pitch_ac(wav, mel.shape[0], hp_f0)
        clips.append({"wav": wav, "mel": mel,
                      "f0": np.asarray(f0, np.float32)})
    return clips


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--segment-frames", type=int, default=32)
    ap.add_argument("--n-clips", type=int, default=16)
    ap.add_argument("--real-wav", default=None,
                    help="train/score on a REAL vocal recording instead of "
                         "synthetic singing: cut into 2 s windows (first "
                         "window held out); closes the data-realism axis "
                         "of the synthetic A/B")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu-smoke", action="store_true")
    args = ap.parse_args()
    if args.out is None:
        # smoke runs must never clobber the committed TPU artifact set
        args.out = (os.path.join(REPO, "runs/vocoder_ab_smoke")
                    if args.cpu_smoke
                    else os.path.join(REPO, "runs/vocoder_ab"))

    from diffsvc_tpu.utils.compile_cache import enable as _cc

    _cc()
    import jax

    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.ops.stft_loss import multi_resolution_stft_loss
    from diffsvc_tpu.training.vocoder_task import VocoderTask, crop_batch
    from diffsvc_tpu.utils.audio_io import save_wav
    from tools.train_istft_tpu import make_clips

    log(f"devices: {jax.devices()}")
    os.makedirs(args.out, exist_ok=True)

    if args.cpu_smoke:
        sr, hop, nfft, win, nmel, dur = 8000, 64, 256, 256, 16, 1.0
        istft_dims = dict(istft_dim=64, istft_layers=2)
        nsf_dims = dict(upsample_initial_channel=32,
                        upsample_rates=[4, 4, 4],
                        upsample_kernel_sizes=[8, 8, 8],
                        resblock_kernel_sizes=[3],
                        resblock_dilation_sizes=[[1, 3]])
        args.steps = min(args.steps, 4)
        args.n_clips = min(args.n_clips, 4)
    else:
        sr, hop, nfft, win, nmel, dur = 44100, 512, 2048, 2048, 128, 2.0
        istft_dims = dict(istft_dim=512, istft_layers=8)
        nsf_dims = {}  # openvpi production defaults in VocoderTask

    if args.real_wav:
        clips = make_real_clips(args.real_wav, sr, dur, hop, nmel, nfft,
                                win, 40.0, 16000.0 if sr > 16000 else 3500.0)
        # --n-clips caps real windows too (the cpu smoke can't afford 20+)
        clips = clips[: max(args.n_clips, 2)]
        log(f"real recording: {args.real_wav} -> {len(clips)} clips")
    else:
        clips = make_clips(sr, args.n_clips, dur, hop, nmel, nfft, win,
                           40.0, 16000.0 if sr > 16000 else 3500.0)
    held_out, train_clips = clips[0], clips[1:]
    log(f"clips: {len(train_clips)} train + 1 held-out, "
        f"{held_out['mel'].shape[0]} frames each")

    def run_family(name, extra_hp):
        hp = HParams(
            audio_sample_rate=sr, hop_size=hop, fft_size=nfft, win_size=win,
            audio_num_mel_bins=nmel, fmin=40,
            fmax=16000 if sr > 16000 else 3500, use_nsf=True,
            vocoder_lr=2e-4, lambda_mel=45.0, seed=1234, **extra_hp)
        task = VocoderTask(hp)
        state = task.init_state()

        def render(g_params):
            m = jnp.asarray(held_out["mel"])[None]
            f = jnp.asarray(held_out["f0"])[None]
            if task.family == "istft":
                y = task._istft.apply(g_params, task.icfg, m, f)
            else:
                from diffsvc_tpu.ops import mel as mel_ops
                from diffsvc_tpu.vocoders import generator as gen

                y = gen.apply(g_params, task.cfg, m * mel_ops.LN_10, f,
                              jax.random.PRNGKey(7))
            mel_hat = task._mel_for_loss(y)
            n = min(mel_hat.shape[1], m.shape[1])
            l1 = jnp.abs(mel_hat[:, :n] - m[:, :n]).mean()
            tgt = jnp.asarray(held_out["wav"])
            ln = min(y.shape[1], tgt.shape[0])
            sc, mag = multi_resolution_stft_loss(y[0, :ln], tgt[:ln])
            return l1, sc + mag, y[0]

        render_fn = jax.jit(render)
        l1_b, stft_b, wav_b = (float(x) if i < 2 else x
                               for i, x in enumerate(render_fn(state["g_params"])))
        log(f"[{name}] held-out before: mel-L1 {l1_b:.4f} "
            f"mr-stft {stft_b:.4f}")
        save_wav(np.asarray(wav_b), f"{args.out}/{name}_before.wav", sr)

        # identical crop schedule across families: same seed, same picks
        rng_np = np.random.RandomState(0)
        rng = jax.random.PRNGKey(0)
        curve = []
        t0 = time.time()
        for step in range(1, args.steps + 1):
            picks = [train_clips[rng_np.randint(len(train_clips))]
                     for _ in range(args.batch)]
            batch = crop_batch(picks, hp, rng_np,
                               segment_frames=args.segment_frames)
            state, metrics = task.train_step(state, batch,
                                             jax.random.fold_in(rng, step))
            if step == 1:
                jax.block_until_ready(metrics["g_loss"])
                log(f"[{name}] compile+first step: {time.time()-t0:.1f}s")
                t0 = time.time()
            if step % 100 == 0 or step == args.steps:
                curve.append({"step": step,
                              **{k: round(float(v), 4)
                                 for k, v in metrics.items()}})
                log(f"[{name}] step {step}: g_mel "
                    f"{curve[-1]['g_mel']:.4f} d {curve[-1]['d_loss']:.3f}")
        steps_s = (args.steps - 1) / max(time.time() - t0, 1e-9)
        l1_a, stft_a, wav_a = (float(x) if i < 2 else x
                               for i, x in enumerate(render_fn(state["g_params"])))
        log(f"[{name}] held-out after {args.steps} steps: mel-L1 {l1_a:.4f} "
            f"mr-stft {stft_a:.4f} ({steps_s:.2f} steps/s)")
        save_wav(np.asarray(wav_a), f"{args.out}/{name}_after.wav", sr)
        # keep the trained generator so renders are reproducible without
        # retraining (pytree pickle; small at these dims)
        import pickle

        with open(f"{args.out}/{name}_g.pkl", "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, state["g_params"]), f)
        return {
            "family": name, "steps": args.steps,
            "steps_per_s": round(steps_s, 3),
            "held_out": {"mel_l1_before": round(l1_b, 4),
                         "mel_l1_after": round(l1_a, 4),
                         "mr_stft_before": round(stft_b, 4),
                         "mr_stft_after": round(stft_a, 4)},
            "loss_curve": curve,
        }

    results = {}
    results["nsf"] = run_family("nsf", dict(vocoder="NsfHifiGAN", **nsf_dims))
    results["istft"] = run_family("istft",
                                  dict(vocoder="istftvocoder", **istft_dims))
    save_wav(held_out["wav"], f"{args.out}/target.wav", sr)

    summary = {
        "device": str(jax.devices()[0]),
        "dims": {"sr": sr, "hop": hop, "n_fft": nfft, "n_mels": nmel,
                 "batch": args.batch, "segment_frames": args.segment_frames,
                 "clips": args.n_clips, **istft_dims},
        "recipe": "shared VocoderTask GAN (MPD+MSD + FM + 45*mel-L1), "
                  "same clips/seeds/crop schedule",
        "data": (f"real:{args.real_wav}" if args.real_wav
                 else "synthetic singing (make_clips)"),
        "results": results,
    }
    with open(f"{args.out}/summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    log(f"summary -> {args.out}/summary.json")
    print(json.dumps({
        "ab": {k: v["held_out"] for k, v in results.items()}}))


if __name__ == "__main__":
    main()
