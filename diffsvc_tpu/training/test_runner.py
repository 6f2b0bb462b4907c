"""Test-split inference: full sampling over the test set with wav/plot/npy
artifact saving.

Parity target: reference ``FastSpeech2Task.test_step/after_infer/save_result``
(training/task/fs2.py:354-525): per item — sample with GT mel2ph/f0, vocode,
save ``generated_<step>_<name>/wavs/*.wav``, mel plots, ``P_mels_npy`` /
``G_mels_npy`` arrays, optional GT renders and f0 overlay plots. Artifact
writing runs on a process pool like the reference's mp Pool.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np

from ..config.hparams import HParams
from ..data.dataset import BatchIterator, FastSpeechDataset
from ..data.batching import batch_by_size
from ..ops.pitch import denorm_f0
from ..utils.audio_io import save_wav
from ..utils.plot import spec_to_figure


def save_result(wav_out, mel, prefix, item_name, gen_dir, work_dir, sr,
                f0=None):
    item_name = str(item_name).replace("/", "-")
    base_fn = f"[{prefix}][{item_name}]"
    save_wav(wav_out, f"{gen_dir}/wavs/{base_fn}.wav", sr)
    np.save(os.path.join(work_dir, f"{prefix}_mels_npy", item_name), mel)
    try:
        # spec_to_figure returns a pyplot-free Figure: fig.savefig is
        # thread-safe (this runs inside the artifact thread pool) and
        # always saves THIS figure, not pyplot's "current" one
        fig = spec_to_figure(mel)
        fig.savefig(f"{gen_dir}/plot/{base_fn}.png", format="png")
    except Exception as e:
        print(f"| plot failed: {e}")


def run_test(hp: HParams, task, state, vocoder=None, global_step: int = 0):
    """Run the test split through full sampling and save artifacts."""
    test_ds = FastSpeechDataset("test", hp, shuffle=False)
    batches = batch_by_size(list(range(len(test_ds))), test_ds.num_tokens,
                            max_tokens=hp.get("max_eval_tokens", 60000) or 60000,
                            max_sentences=1)
    it = BatchIterator(test_ds, batches,
                       pad_multiple=int(hp.get("frames_multiple", 128)))
    gen_dir = os.path.join(hp["work_dir"],
                           f"generated_{global_step}_{hp.get('gen_dir_name', '')}")
    os.makedirs(f"{gen_dir}/wavs", exist_ok=True)
    os.makedirs(f"{gen_dir}/plot", exist_ok=True)
    os.makedirs(os.path.join(hp["work_dir"], "P_mels_npy"), exist_ok=True)
    os.makedirs(os.path.join(hp["work_dir"], "G_mels_npy"), exist_ok=True)

    pool = ThreadPoolExecutor(max_workers=min(os.cpu_count() or 4, 16))
    futures = []
    rng = jax.random.PRNGKey(hp.get("seed", 1234))
    sr = hp["audio_sample_rate"]
    for i, batch in enumerate(it):
        sample_params = state.get("ema_params", state["params"])
        out = task.sample(sample_params, batch, jax.random.fold_in(rng, i))
        mel_pred = np.asarray(out["mel_out"][0])
        mask = np.abs(mel_pred).sum(-1) > 0
        mel_pred = np.clip(mel_pred[mask], hp["mel_vmin"], hp["mel_vmax"])
        f0_pred = np.asarray(out["f0_denorm"][0])[: len(mask)][mask]
        item_name = batch["item_name"][0]
        if vocoder is not None:
            wav_pred = vocoder.spec2wav(mel_pred, f0=f0_pred)
            futures.append(pool.submit(
                save_result, wav_pred, mel_pred, "P", item_name, gen_dir,
                hp["work_dir"], sr, f0_pred))
            if hp.get("save_gt"):
                mel_gt = np.asarray(batch["mels"][0])
                gt_mask = np.abs(mel_gt).sum(-1) > 0
                mel_gt = np.clip(mel_gt[gt_mask], hp["mel_vmin"], hp["mel_vmax"])
                f0_gt = np.asarray(denorm_f0(
                    batch["f0"][0], batch["uv"][0],
                    pitch_norm=hp.get("pitch_norm", "log"),
                    use_uv=hp.get("use_uv", False),
                    f0_mean=float(hp.get("f0_mean", 0.0) or 0.0),
                    f0_std=float(hp.get("f0_std", 1.0) or 1.0)))[: len(gt_mask)][gt_mask]
                wav_gt = vocoder.spec2wav(mel_gt, f0=f0_gt)
                futures.append(pool.submit(
                    save_result, wav_gt, mel_gt, "G", item_name, gen_dir,
                    hp["work_dir"], sr, f0_gt))
        else:
            np.save(os.path.join(hp["work_dir"], "P_mels_npy",
                                 str(item_name).replace("/", "-")), mel_pred)
        print(f"| test item {i}: {item_name} pred {mel_pred.shape}")
    for f in futures:
        f.result()
    pool.shutdown()
    print(f"| test artifacts under {gen_dir}")
    return gen_dir
