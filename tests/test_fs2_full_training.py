"""no_fs2: false path: encoder transformer in the loop, gradients flow."""

import jax
import numpy as np

from diffsvc_tpu.config import HParams
from diffsvc_tpu.training.task import SVCTask


def test_fs2_full_training_step():
    hp = HParams(
        audio_num_mel_bins=16, hidden_size=32, residual_layers=4,
        residual_channels=16, dilation_cycle_length=4, timesteps=20,
        K_step=20, diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=16, spec_min=[-6.0], spec_max=[1.5],
        no_fs2=False, enc_layers=2, dec_layers=2, enc_ffn_kernel_size=9,
        dec_ffn_kernel_size=9, num_heads=2, dropout=0.1,
        use_pitch_embed=True, use_energy_embed=False, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=50.0, f0_max=1100.0,
        lr=1e-3, scheduler="step_lr", decay_steps=100,
        optimizer_adam_beta1=0.9, optimizer_adam_beta2=0.98, weight_decay=0,
        clip_grad_norm=1, accumulate_grad_batches=1, seed=0,
    )
    task = SVCTask(hp)
    state = task.init_state()
    assert "encoder" in state["params"]["fs2"]

    rng = np.random.RandomState(0)
    b, tm, tp = 2, 32, 16
    mel2ph = np.clip((np.arange(tm)[None, :] * tp // tm) + 1, 1, tp
                     ).astype(np.int32) * np.ones((b, 1), np.int32)
    batch = {
        "hubert": rng.randn(b, tp, 32).astype(np.float32) * 0.1,
        "mel2ph": mel2ph,
        "f0": np.full((b, tm), 7.78, np.float32),
        "uv": np.zeros((b, tm), np.float32),
        "energy": np.zeros((b, tm), np.float32),
        "mels": rng.randn(b, tm, 16).astype(np.float32),
    }
    key = jax.random.PRNGKey(0)
    p0 = np.asarray(state["params"]["fs2"]["encoder"]["layers"][0]["attn"]["q"]["w"]).copy()
    for _ in range(3):
        state, metrics = task.train_step(state, batch, key)
    assert np.isfinite(float(metrics["loss"]))
    p1 = np.asarray(state["params"]["fs2"]["encoder"]["layers"][0]["attn"]["q"]["w"])
    assert not np.allclose(p0, p1)  # encoder params updated


def test_fft_decoder_training_step():
    hp = HParams(
        audio_num_mel_bins=16, hidden_size=32, residual_layers=4,
        residual_channels=16, dilation_cycle_length=4, timesteps=20,
        K_step=20, diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=16, spec_min=[-6.0], spec_max=[1.5],
        no_fs2=True, diff_decoder_type="fft", dec_layers=2,
        dec_ffn_kernel_size=9, num_heads=2,
        use_pitch_embed=True, use_energy_embed=False, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=50.0, f0_max=1100.0,
        lr=1e-3, scheduler="step_lr", decay_steps=100,
        optimizer_adam_beta1=0.9, optimizer_adam_beta2=0.98, weight_decay=0,
        clip_grad_norm=1, accumulate_grad_batches=1, seed=0,
    )
    task = SVCTask(hp)
    state = task.init_state()
    rng = np.random.RandomState(0)
    b, tm, tp = 2, 32, 16
    mel2ph = np.ones((b, tm), np.int32)
    batch = {
        "hubert": rng.randn(b, tp, 32).astype(np.float32) * 0.1,
        "mel2ph": mel2ph,
        "f0": np.full((b, tm), 7.78, np.float32),
        "uv": np.zeros((b, tm), np.float32),
        "energy": np.zeros((b, tm), np.float32),
        "mels": rng.randn(b, tm, 16).astype(np.float32),
    }
    state, metrics = task.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_compat_imports():
    """Reference-style imports must resolve."""
    from infer_tools import infer_tool, slicer  # noqa: F401

    assert hasattr(infer_tool, "Svc")
    assert hasattr(slicer, "cut")
