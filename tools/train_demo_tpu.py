"""Real-chip training demo (VERDICT r2 #4): run Trainer.fit at production
44.1 kHz dims on the actual TPU for a few hundred steps, with validation
sampling + TensorBoard audio via a random-weight NSF-HiFiGAN, then resume
and train further — proving the training product end-to-end where it
ships (reference semantics: utils/pl_utils.py:1320-1441).

Dataset: synthetic singing (harmonic voices with vibrato and phrase gaps)
binarized by the real SVCBinarizer; HuBERT units come from sidecar .npy
files (the product's sibling-cache path, hubertinfer.py:13-42) computed as
a fixed random projection of framed audio — content-correlated, so the
diffusion loss has real structure to learn.

Writes runs/tpu_train_demo/summary.json: the loss curve, steps/s on the
chip, checkpoint list, TB artifact inventory, and resume evidence.

Usage: python tools/train_demo_tpu.py [--steps 300] [--resume-steps 100]
"""

import argparse
import glob
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


class RecordingWriter:
    """SummaryWriter shim: records scalars for the summary AND delegates to
    a real TensorBoard writer so the artifacts exist on disk."""

    def __init__(self, logdir):
        from torch.utils.tensorboard import SummaryWriter

        self.tb = SummaryWriter(logdir)
        self.scalars = {}
        self.artifacts = []

    def add_scalar(self, tag, value, step):
        self.scalars.setdefault(tag, []).append((int(step), float(value)))
        self.tb.add_scalar(tag, value, step)

    def add_figure(self, tag, fig, step):
        self.artifacts.append(("figure", tag, int(step)))
        self.tb.add_figure(tag, fig, step)

    def add_audio(self, tag, wav, step, sr):
        self.artifacts.append(("audio", tag, int(step)))
        self.tb.add_audio(tag, wav, step, sr)

    def flush(self):
        self.tb.flush()

    def close(self):
        self.tb.close()


def make_nsf_vocoder_ckpt(dirpath, nmel=128, sr=44100, hop=512):
    """Random-weight NSF-HiFiGAN at openvpi production dims in the exact
    reference on-disk format (config.json + 'generator' state dict with
    weight norm), so the real converter/wrapper path runs."""
    import torch
    import torch.nn as tnn

    wn = tnn.utils.weight_norm
    torch.manual_seed(0)
    m = tnn.Module()
    rates = [8, 8, 2, 2, 2]
    kerns = [16, 16, 4, 4, 4]
    c0 = 512
    m.conv_pre = wn(tnn.Conv1d(nmel, c0, 7, padding=3))
    ups, ncs, rbs = [], [], []
    ch = c0
    for i, (u, k) in enumerate(zip(rates, kerns)):
        c = c0 // (2 ** (i + 1))
        ups.append(wn(tnn.ConvTranspose1d(ch, c, k, u, padding=(k - u) // 2)))
        if i + 1 < len(rates):
            sf = 1
            for r in rates[i + 1:]:
                sf *= r
            ncs.append(tnn.Conv1d(1, c, kernel_size=sf * 2, stride=sf,
                                  padding=sf // 2))
        else:
            ncs.append(tnn.Conv1d(1, c, kernel_size=1))
        for krb, drb in zip((3, 7, 11), ((1, 3, 5),) * 3):
            blk = tnn.Module()
            blk.convs1 = tnn.ModuleList(
                [wn(tnn.Conv1d(c, c, krb, padding=(krb * d - d) // 2,
                               dilation=d)) for d in drb])
            blk.convs2 = tnn.ModuleList(
                [wn(tnn.Conv1d(c, c, krb, padding=(krb - 1) // 2))
                 for _ in drb])
            rbs.append(blk)
        ch = c
    m.ups = tnn.ModuleList(ups)
    m.noise_convs = tnn.ModuleList(ncs)
    m.resblocks = tnn.ModuleList(rbs)
    ms = tnn.Module()
    ms.l_linear = tnn.Linear(9, 1)
    m.m_source = ms
    m.conv_post = wn(tnn.Conv1d(ch, 1, 7, padding=3))
    os.makedirs(dirpath, exist_ok=True)
    torch.save({"generator": m.state_dict()}, os.path.join(dirpath, "model"))
    cfg = dict(num_mels=nmel, upsample_initial_channel=c0,
               upsample_rates=rates, upsample_kernel_sizes=kerns,
               resblock="1", resblock_kernel_sizes=[3, 7, 11],
               resblock_dilation_sizes=[[1, 3, 5]] * 3, sampling_rate=sr,
               n_fft=2048, win_size=2048, hop_size=hop, fmin=40, fmax=16000)
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(cfg, f)


def make_dataset(raw_dir, sr=44100, n_clips=16, dur=2.0, hidden=256):
    """Synthetic singing clips + content-correlated sidecar units."""
    import numpy as np

    from diffsvc_tpu.utils.audio_io import save_wav

    os.makedirs(raw_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    proj = (rng.randn(320, hidden) / np.sqrt(320)).astype(np.float32)
    notes = [196.0, 220.0, 247.0, 262.0, 294.0, 330.0, 349.0, 392.0]
    for i in range(n_clips):
        t = np.arange(int(sr * dur)) / sr
        f0c = notes[i % len(notes)] * 2 ** (
            0.04 * np.sin(2 * np.pi * (4.5 + 0.3 * i) * t)
            + 0.2 * np.sin(2 * np.pi * 0.4 * t + i))
        ph = np.cumsum(2 * np.pi * f0c / sr)
        wav = (0.35 * np.sin(ph) + 0.2 * np.sin(2 * ph)
               + 0.1 * np.sin(3 * ph) + 0.01 * rng.randn(len(t)))
        env = 0.5 + 0.5 * np.sin(2 * np.pi * 0.8 * t + i)  # phrasing
        wav = (wav * env).astype(np.float32)
        save_wav(wav, f"{raw_dir}/clip{i:02d}.wav", sr)
        # sidecar units on the 16 kHz/320 hubert grid
        n16 = int(len(wav) * 16000 / sr)
        wav16 = np.interp(np.arange(n16) / 16000, t, wav).astype(np.float32)
        n_units = max((n16 + 2 * 40) // 320, 1)
        frames = np.zeros((n_units, 320), np.float32)
        for j in range(n_units):
            seg = wav16[j * 320: j * 320 + 320]
            frames[j, : len(seg)] = seg
        np.save(f"{raw_dir}/clip{i:02d}.npy", frames @ proj)


def make_real_dataset(raw_dir, wav_path, sr=44100, n_clips=0, dur=2.0,
                      hidden=256):
    """Real-recording dataset in the make_dataset layout: cut a vocal wav
    into non-overlapping ``dur``-second windows and emit clipNN.wav plus
    content-correlated sidecar units (same fixed 320->hidden projection of
    the 16 kHz frames as the synthetic recipe, so no hubert checkpoint is
    needed). ``n_clips`` <= 0 keeps every full window."""
    import numpy as np
    from scipy.io import wavfile

    from diffsvc_tpu.utils.audio_io import resample, save_wav

    os.makedirs(raw_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    proj = (rng.randn(320, hidden) / np.sqrt(320)).astype(np.float32)
    sr0, w = wavfile.read(wav_path)
    if w.ndim > 1:
        w = w.mean(-1)
    if np.issubdtype(w.dtype, np.integer):
        # iinfo.max (32767 for int16) — matches FusedSvc.to_float
        w = w.astype(np.float32) / float(np.iinfo(w.dtype).max)
    w = w.astype(np.float32)
    if sr0 != sr:
        w = resample(w, sr0, sr)
    n = int(sr * dur)
    starts = list(range(0, len(w) - n + 1, n))
    if n_clips and n_clips > 0:
        starts = starts[:n_clips]
    for i, s in enumerate(starts):
        wav = np.asarray(w[s:s + n], np.float32)
        save_wav(wav, f"{raw_dir}/clip{i:02d}.wav", sr)
        n16 = int(len(wav) * 16000 / sr)
        t = np.arange(len(wav)) / sr
        wav16 = np.interp(np.arange(n16) / 16000, t, wav).astype(np.float32)
        n_units = max((n16 + 2 * 40) // 320, 1)
        frames = np.zeros((n_units, 320), np.float32)
        for j in range(n_units):
            seg = wav16[j * 320: j * 320 + 320]
            frames[j, : len(seg)] = seg
        np.save(f"{raw_dir}/clip{i:02d}.npy", frames @ proj)
    return len(starts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--resume-steps", type=int, default=100)
    ap.add_argument("--val-interval", type=int, default=100)
    ap.add_argument("--out", default=os.path.join(REPO, "runs/tpu_train_demo"))
    args = ap.parse_args()

    from diffsvc_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax
    import numpy as np
    import yaml

    log(f"| device: {jax.devices()[0]}")
    scratch = tempfile.mkdtemp(prefix="tpu_train_demo_")
    os.makedirs(args.out, exist_ok=True)
    sr, hop = 44100, 512

    log("| building dataset + vocoder ckpt ...")
    make_dataset(f"{scratch}/raw", sr=sr)
    make_nsf_vocoder_ckpt(f"{scratch}/vocoder")

    hp_dict = dict(
        audio_sample_rate=sr, audio_num_mel_bins=128, fft_size=2048,
        hop_size=hop, win_size=2048, fmin=40, fmax=16000,
        hidden_size=256, residual_layers=20, residual_channels=384,
        dilation_cycle_length=4, timesteps=1000, K_step=1000,
        diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=128, spec_min=[-5.0], spec_max=[0.0],
        no_fs2=True, use_pitch_embed=True, use_energy_embed=False,
        use_spk_id=False, use_spk_embed=False, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=40.0, f0_max=1100.0,
        use_nsf=True, use_crepe=False, use_vec=False,
        vocoder="NsfHifiGAN", vocoder_ckpt=f"{scratch}/vocoder/model",
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
        max_updates=args.steps, val_check_interval=args.val_interval,
        num_sanity_val_steps=1, num_valid_plots=1, num_ckpt_keep=3,
        lr=8e-4, scheduler="step_lr", decay_steps=50000,
        optimizer_adam_beta1=0.9, optimizer_adam_beta2=0.98, weight_decay=0,
        clip_grad_norm=1, accumulate_grad_batches=1, seed=1234,
        save_ckpt=True, endless_ds=True, ds_workers=0, test_num=2,
        valid_num=0, train_set_name="train", valid_set_name="valid",
        test_set_name="test",
    )
    cfg_path = f"{scratch}/config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(hp_dict, f)

    # --- binarize via the real CLI path ---
    from diffsvc_tpu.config.hparams import set_hparams

    log("| binarizing ...")
    hp = set_hparams(config=cfg_path, exp_name="tpu_demo", reset=True,
                     print_hparams=False)
    from diffsvc_tpu.data.binarizer import binarize

    binarize(hp)

    # --- train on the real chip ---
    from diffsvc_tpu.training.trainer import Trainer

    writer = RecordingWriter(f"{scratch}/work/tb")
    trainer = Trainer(hp, log_writer=writer)
    log(f"| training {args.steps} steps on {jax.default_backend()} ...")
    t0 = time.time()
    trainer.fit()
    wall1 = time.time() - t0
    step1 = trainer.global_step
    ckpts1 = sorted(glob.glob(f"{scratch}/work/model_ckpt_steps_*.ckpt"))
    log(f"| phase 1 done: step={step1} wall={wall1:.0f}s "
        f"ckpts={[os.path.basename(c) for c in ckpts1]}")

    # --- resume: fresh Trainer must pick up the latest checkpoint ---
    hp["max_updates"] = args.steps + args.resume_steps
    trainer2 = Trainer(hp, log_writer=writer)
    t0 = time.time()
    trainer2.fit()
    wall2 = time.time() - t0
    step2 = trainer2.global_step
    ckpts2 = sorted(glob.glob(f"{scratch}/work/model_ckpt_steps_*.ckpt"))
    log(f"| resume done: step={step2} wall={wall2:.0f}s")
    writer.close()

    tr_loss = writer.scalars.get("tr/loss", writer.scalars.get(
        "tr/mel", list(writer.scalars.values())[0] if writer.scalars else []))
    val_loss = writer.scalars.get("val/loss", [])
    # steady-state steps/s from phase-2 wall time (no binarize/compile)
    summary = {
        "device": str(jax.devices()[0]),
        "backend": jax.default_backend(),
        "dims": "44.1k production: 128 mel, 384ch x 20 layers, K=1000",
        "batch": "8 x 172 frames",
        "phase1": {"steps": step1, "wall_s": round(wall1, 1)},
        "resume": {"from_step": step1, "to_step": step2,
                   "wall_s": round(wall2, 1),
                   "steps_per_s": round(args.resume_steps / wall2, 2)},
        "checkpoints": [os.path.basename(c) for c in ckpts2],
        "scalar_tags": sorted(writer.scalars),
        "tr_loss_curve": tr_loss,
        "val_loss_curve": val_loss,
        "tb_artifacts": writer.artifacts,
    }
    with open(f"{args.out}/summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    shutil.copy(cfg_path, f"{args.out}/config.yaml")
    curve = val_loss or tr_loss   # val is logged every val_check_interval
    first = curve[0][1] if curve else float("nan")
    last = curve[-1][1] if curve else float("nan")
    log(f"| loss first {first:.4f} -> last {last:.4f}")
    assert step2 == args.steps + args.resume_steps, (step1, step2)
    if args.steps >= 50:
        assert last < first, "loss did not decrease"
    print(json.dumps({"metric": "tpu_train_demo", "steps": step2,
                      "loss_first": round(float(first), 4),
                      "loss_last": round(float(last), 4),
                      "steps_per_s": summary["resume"]["steps_per_s"]}))
    log(f"| summary written to {args.out}/summary.json")


if __name__ == "__main__":
    main()
