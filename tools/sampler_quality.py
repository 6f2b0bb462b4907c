"""Sampler solver error on a REAL trained denoiser.

tests/test_dpmpp.py quantifies the PLMS / DPM-Solver++ trade-off against
EXACT analytic scores; this tool does the same measurement on a LEARNED
score: train the SVC diffusion task on synthetic singing (same dataset
recipe as tools/train_demo_tpu.py), then, from the SAME x_T, compare each
sampler's mel output to a fine-grid probability-flow reference (dpmpp at
interval 2, ~500 NFE). The distance to that reference is pure solver
error — model error cancels because every sampler integrates the same
learned ODE from the same start.

Reported per sampler config: mean |mel - mel_ref| over held-out items
(log10-mel domain, voiced-frame masked) plus mean |mel - mel_gt| for
context. Writes runs/sampler_quality/summary.json and prints one JSON
line on stdout.

Usage:
    python tools/sampler_quality.py                 # production dims (TPU)
    python tools/sampler_quality.py --tiny --steps 200   # CPU smoke
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--n-clips", type=int, default=16,
                    help="dataset size; small counts + many steps give an "
                         "overfit score whose probability-flow ODE leaves "
                         "the manifold (see runs/sampler_quality r4 notes)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dims on CPU (smoke/regression)")
    ap.add_argument("--real-wav", default=None,
                    help="train on non-overlapping windows of this real "
                         "vocal recording (tools/train_demo_tpu."
                         "make_real_dataset) instead of synthetic singing "
                         "— the real-data leg of the fast/turbo profile "
                         "evidence (VERDICT r4 #5)")
    ap.add_argument("--out", default=os.path.join(REPO, "runs/sampler_quality"))
    ap.add_argument("--keep-ckpt", default=None,
                    help="after training, copy the work dir (checkpoints + "
                         "config) here so later sweeps can --reuse-ckpt it "
                         "instead of retraining")
    ap.add_argument("--reuse-ckpt", default=None,
                    help="skip training; restore from this previously kept "
                         "work-dir copy (dims/--n-clips/--tiny must match "
                         "the run that produced it — the dataset is rebuilt "
                         "deterministically from the same recipe)")
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from diffsvc_tpu.utils.compile_cache import enable as _cc

    _cc()
    import jax
    import numpy as np
    import yaml

    from tools.train_demo_tpu import make_dataset, make_real_dataset

    log(f"| device: {jax.devices()[0]}")
    scratch = tempfile.mkdtemp(prefix="sampler_quality_")
    log(f"| scratch: {scratch}")
    os.makedirs(args.out, exist_ok=True)

    if args.tiny:
        sr, hop, nfft, nmel = 8000, 64, 256, 16
        dims = dict(hidden_size=256, residual_layers=4, residual_channels=32,
                    fmax=3500)
        dur = 1.5
    else:
        sr, hop, nfft, nmel = 44100, 512, 2048, 128
        dims = dict(hidden_size=256, residual_layers=20,
                    residual_channels=384, fmax=16000)
        dur = 2.0

    log("| building dataset ...")
    if args.real_wav:
        n_real = make_real_dataset(f"{scratch}/raw", args.real_wav, sr=sr,
                                   dur=dur, n_clips=args.n_clips)
        log(f"| real recording: {args.real_wav} -> {n_real} windows")
    else:
        make_dataset(f"{scratch}/raw", sr=sr, dur=dur, n_clips=args.n_clips)

    hp_dict = dict(
        audio_sample_rate=sr, audio_num_mel_bins=nmel, fft_size=nfft,
        hop_size=hop, win_size=nfft, fmin=40,
        dilation_cycle_length=4, timesteps=1000, K_step=1000,
        diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=nmel, spec_min=[-5.0], spec_max=[0.0],
        no_fs2=True, use_pitch_embed=True, use_energy_embed=False,
        use_spk_id=False, use_spk_embed=False, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=40.0, f0_max=1100.0,
        use_nsf=True, use_crepe=False, use_vec=False,
        vocoder="NsfHifiGAN", vocoder_ckpt="",  # mel-domain study: no vocoder
        hubert_path=f"{scratch}/nonexistent_hubert", pe_ckpt="",
        pe_enable=False, max_frames=42000, max_input_tokens=60000,
        mel_vmin=-6.0, mel_vmax=1.5, num_spk=1,
        binarization_args=dict(with_f0=True, with_hubert=True,
                               with_align=True),
        work_dir=f"{scratch}/work", pndm_speedup=20, debug=False,
        raw_data_dir=f"{scratch}/raw", binary_data_dir=f"{scratch}/binary",
        speaker_id="demo", binarizer_cls="preprocessing.SVCpre.SVCBinarizer",
        task_cls="training.task.SVC_task.SVCTask",
        max_sentences=8, max_tokens=100000,
        # checkpoint every <=1000 steps (not only at the end): a tunnel
        # outage mid-run leaves a resumable work dir in the scratch
        max_updates=args.steps,
        val_check_interval=max(min(args.steps, 1000), 100),
        num_sanity_val_steps=0, num_valid_plots=0, num_ckpt_keep=2,
        lr=8e-4, scheduler="step_lr", decay_steps=50000,
        optimizer_adam_beta1=0.9, optimizer_adam_beta2=0.98, weight_decay=0,
        clip_grad_norm=1, accumulate_grad_batches=1, seed=1234,
        save_ckpt=True, endless_ds=True, ds_workers=0, test_num=2,
        valid_num=0, train_set_name="train", valid_set_name="valid",
        test_set_name="test", **dims,
    )
    cfg_path = f"{scratch}/config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(hp_dict, f)

    from diffsvc_tpu.config.hparams import set_hparams

    log("| binarizing ...")
    hp = set_hparams(config=cfg_path, exp_name="sampler_q", reset=True,
                     print_hparams=False)
    from diffsvc_tpu.data.binarizer import binarize

    binarize(hp)

    from diffsvc_tpu.training import checkpoint as ckpt_lib
    from diffsvc_tpu.training.trainer import Trainer

    if args.reuse_ckpt:
        shutil.copytree(args.reuse_ckpt, hp["work_dir"], dirs_exist_ok=True)
        log(f"| reusing checkpoint from {args.reuse_ckpt}")
    else:
        log(f"| training {args.steps} steps on {jax.default_backend()} ...")
        t0 = time.time()
        Trainer(hp).fit()
        log(f"| trained in {time.time()-t0:.0f}s")
        if args.keep_ckpt:
            shutil.copytree(hp["work_dir"], args.keep_ckpt,
                            dirs_exist_ok=True)
            log(f"| kept checkpoint at {args.keep_ckpt}")
    state, _, gstep, _ = ckpt_lib.restore_checkpoint(hp["work_dir"])
    params = state.get("ema_params", state["params"])

    # --- held-out batch -----------------------------------------------------
    from diffsvc_tpu.data.dataset import FastSpeechDataset

    ds = FastSpeechDataset("test", hp, shuffle=False)
    samples = [ds[i] for i in range(min(2, len(ds)))]
    batch = ds.collater(samples)
    keys = ("hubert", "mels", "mel2ph", "energy", "f0", "uv")
    jb = {k: jax.numpy.asarray(batch[k]) for k in keys
          if batch.get(k) is not None}
    b, t_mel = jb["mel2ph"].shape
    x_T = jax.random.normal(jax.random.PRNGKey(77), (b, t_mel, nmel))
    mask = np.asarray(jb["mel2ph"] > 0)[..., None]
    gt = np.asarray(jb["mels"])

    from diffsvc_tpu.models.diffusion import GaussianDiffusion

    def run(sampler, speedup, grid="lambda", clip=0.0):
        hp2 = hp.copy()
        hp2["sampler"] = sampler
        hp2["dpmpp_grid"] = grid
        hp2["sampler_clip_x0"] = clip
        model = GaussianDiffusion(hp2)
        out = model.infer(params, jb, jax.random.PRNGKey(3),
                          speedup=speedup, init_noise=x_T)
        return np.asarray(out["mel_out"])

    log("| sampling (reference: dpmpp interval 2, ~500 NFE) ...")
    ref = run("dpmpp", 2)
    # fairness cross-check: a fine-grid PLMS must converge to the SAME
    # probability-flow solution, otherwise the reference is solver-biased
    ref_plms = run("plms", 2)
    cross = float((np.abs(ref_plms - ref) * mask).sum() / mask.sum() / nmel)
    log(f"| cross-reference |plms_fine - dpmpp_fine| = {cross:.5f}/bin")

    configs = [("plms", 20, "lambda", 0.0), ("plms", 50, "lambda", 0.0),
               ("plms", 20, "lambda", 1.0), ("dpmpp", 50, "lambda", 1.0),
               ("dpmpp", 20, "lambda", 0.0), ("dpmpp", 50, "lambda", 0.0),
               ("dpmpp", 50, "t", 0.0),
               # low-NFE frontier for a possible "turbo" serving profile:
               # interval 100/150/200 -> 11/8/6 NFE. plms100_clip is the
               # like-for-like multistep baseline at 11 NFE; the unclipped
               # dpmpp100 isolates pure solver error at that grid.
               ("dpmpp", 100, "lambda", 1.0), ("dpmpp", 150, "lambda", 1.0),
               ("dpmpp", 200, "lambda", 1.0), ("plms", 100, "lambda", 1.0),
               ("dpmpp", 100, "lambda", 0.0)]
    results = {}
    k_step = int(hp.get("K_step", hp.get("timesteps", 1000)))
    for sampler, acc, grid, clip in configs:
        mel = run(sampler, acc, grid, clip)
        # NFE = scan steps + 1: plms's order-1 bootstrap step calls the
        # denoiser twice; dpmpp does a final data-prediction eval at t=0
        nfe = -(-k_step // acc) + 1
        name = (f"{sampler}{acc}" + ("_tgrid" if grid == "t" else "")
                + ("_clip" if clip else ""))
        results[name] = {
            "nfe": int(nfe),
            "solver_err_l1": round(float(
                (np.abs(mel - ref) * mask).sum() / mask.sum() / nmel), 6),
            "gt_err_l1": round(float(
                (np.abs(mel - gt) * mask).sum() / mask.sum() / nmel), 6),
            # divergence telltale: a healthy sample stays in ~[spec_min,
            # spec_max]; multistep overshoot on an ill-conditioned score
            # shows up as a blown-out range long before the mean moves
            "mel_range": [round(float(mel.min()), 2),
                          round(float(mel.max()), 2)],
        }
        log(f"| {name:16s} NFE {nfe:3d}  |mel-ref| {results[name]['solver_err_l1']:.5f}"
            f"  |mel-gt| {results[name]['gt_err_l1']:.4f}"
            f"  range {results[name]['mel_range']}")

    summary = {
        "device": str(jax.devices()[0]), "backend": jax.default_backend(),
        "dims": "tiny" if args.tiny else "production 44.1k",
        "data": (f"real:{os.path.basename(args.real_wav)}" if args.real_wav
                 else "synthetic"),
        "train_steps": int(gstep), "held_out_items": int(b),
        "reference": "dpmpp interval 2 (~500 NFE), shared x_T",
        "cross_reference_l1": round(cross, 6),
        "samplers": results,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"sampler_quality": results}))


if __name__ == "__main__":
    main()
