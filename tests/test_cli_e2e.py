"""CLI-surface e2e: binarize.py then run.py as real subprocesses on a tiny
synthetic dataset. HuBERT units come from the .npy sibling cache (the
reference's precomputed-units path), so no model weights are needed."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml


@pytest.mark.parametrize("dummy", [0])
def test_binarize_and_train_cli(tmp_path, dummy):
    from diffsvc_tpu.utils.audio_io import save_wav

    raw = tmp_path / "raw"
    raw.mkdir()
    sr = 8000
    rng = np.random.RandomState(0)
    for i in range(8):
        secs = 0.5 + 0.1 * i
        t = np.arange(int(sr * secs)) / sr
        wav = 0.4 * np.sin(2 * np.pi * (150 + 20 * i) * t).astype(np.float32)
        save_wav(wav, str(raw / f"item{i}.wav"), sr)
        # precomputed units sidecar (hubertinfer .npy path)
        n_units = max(int(sr * secs) * 2 // 320, 1)  # 16k-equivalent frames
        np.save(str(raw / f"item{i}.npy"),
                rng.randn(n_units, 32).astype(np.float32) * 0.1)

    cfg = dict(
        task_cls="diffsvc_tpu.training.task.SVCTask",
        binarizer_cls="diffsvc_tpu.data.binarizer.SVCBinarizer",
        audio_sample_rate=sr, audio_num_mel_bins=16, fft_size=256,
        hop_size=64, win_size=256, fmin=30, fmax=4000, wav2spec_eps=1e-6,
        hidden_size=32, residual_layers=4, residual_channels=16,
        dilation_cycle_length=4, timesteps=20, K_step=20,
        diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=16, spec_min=[-6.0], spec_max=[1.5], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=False, use_spk_id=False,
        use_spk_embed=False, use_uv=False, pitch_norm="log", f0_bin=256,
        f0_min=50.0, f0_max=1100.0, use_crepe=False, use_vec=False,
        vocoder="HifiGAN",
        raw_data_dir=str(raw), binary_data_dir=str(tmp_path / "bin"),
        work_dir=str(tmp_path / "work"), speaker_id="cli", num_spk=1,
        choose_test_manually=False, test_prefixes=[],
        hubert_path=str(tmp_path / "nohubert"),
        binarization_args=dict(with_f0=True, with_hubert=True,
                               with_align=True, with_wav=False, shuffle=False),
        lr=1e-3, scheduler="step_lr", decay_steps=100,
        optimizer_adam_beta1=0.9, optimizer_adam_beta2=0.98, weight_decay=0,
        clip_grad_norm=1, accumulate_grad_batches=1,
        max_updates=3, max_epochs=50, max_tokens=4000, max_sentences=4,
        max_eval_tokens=4000, max_eval_sentences=1, max_frames=42000,
        max_input_tokens=60000, frames_multiple=32, endless_ds=False,
        sort_by_len=True, seed=1234, num_sanity_val_steps=1,
        val_check_interval=3, num_valid_plots=0, log_interval=1,
        num_ckpt_keep=2, save_best=False, load_ckpt="", debug=False,
        ds_workers=0, pndm_speedup=5, mel_vmin=-6.0, mel_vmax=1.5,
    )
    cfg_fn = tmp_path / "cfg.yaml"
    cfg["config_path"] = str(cfg_fn)
    with open(cfg_fn, "w") as f:
        yaml.safe_dump(cfg, f)

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # sitecustomize won't force CPU; run with a -c wrapper that does
    wrapper = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy, sys; sys.argv=[sys.argv[1]]+sys.argv[2:];"
        "runpy.run_path(sys.argv[0], run_name='__main__')")

    r = subprocess.run(
        [sys.executable, "-c", wrapper, "binarize.py",
         "--config", str(cfg_fn)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(tmp_path / "bin" / "train.data")

    r = subprocess.run(
        [sys.executable, "-c", wrapper, "run.py",
         "--config", str(cfg_fn), "--exp_name", "cli_e2e", "--reset"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "TRAINING FINISHED" in r.stdout
    import glob

    assert glob.glob(str(tmp_path / "work" / "model_ckpt_steps_*.ckpt"))
