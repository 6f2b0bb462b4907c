import jax
import numpy as np

from diffsvc_tpu.config import HParams
from diffsvc_tpu.training import checkpoint as ckpt_lib
from diffsvc_tpu.training.task import SVCTask


def _hp(**kw):
    hp = HParams(
        audio_num_mel_bins=8, hidden_size=16, residual_layers=4,
        residual_channels=16, dilation_cycle_length=4, timesteps=10,
        K_step=10, diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=8, spec_min=[-6.0], spec_max=[1.5], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=False, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=50.0, f0_max=1100.0,
        lr=1e-2, scheduler="step_lr", decay_steps=100,
        optimizer_adam_beta1=0.9, optimizer_adam_beta2=0.98, weight_decay=0,
        clip_grad_norm=1, accumulate_grad_batches=1, seed=0)
    hp.update(kw)
    return hp


def _batch():
    rng = np.random.RandomState(0)
    return {
        "hubert": rng.randn(1, 4, 16).astype(np.float32) * 0.1,
        "mel2ph": np.ones((1, 8), np.int32),
        "f0": np.full((1, 8), 7.78, np.float32),
        "uv": np.zeros((1, 8), np.float32),
        "energy": np.zeros((1, 8), np.float32),
        "mels": rng.randn(1, 8, 8).astype(np.float32),
    }


def test_ema_tracks_params(tmp_path):
    task = SVCTask(_hp(ema_decay=0.5))
    state = task.init_state()
    assert "ema_params" in state
    batch = _batch()
    for _ in range(3):
        state, _ = task.train_step(state, batch, jax.random.PRNGKey(0))
    p = np.asarray(jax.tree.leaves(state["params"])[0])
    e = np.asarray(jax.tree.leaves(state["ema_params"])[0])
    assert not np.allclose(p, e)  # lags behind
    # ema moved away from init toward params
    task0 = SVCTask(_hp(ema_decay=0.5))
    init = np.asarray(jax.tree.leaves(task0.init_state()["params"])[0])
    assert not np.allclose(e, init)

    # checkpoint roundtrip prefers ema for inference
    ckpt_lib.save_checkpoint(str(tmp_path), state, 0, 3)
    loaded = ckpt_lib.load_params_for_infer(str(tmp_path))
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(loaded)[0]), e)


def test_no_ema_by_default():
    task = SVCTask(_hp())
    state = task.init_state()
    assert "ema_params" not in state
