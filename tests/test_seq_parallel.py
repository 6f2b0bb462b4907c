"""Sequence parallelism: the (data, seq) mesh must produce the same loss and
gradients as a single-device run — XLA's spatial partitioning inserts the
halo exchanges for the dilated convs and the mel2ph gather."""

import jax
import numpy as np

from diffsvc_tpu.config import HParams
from diffsvc_tpu.parallel import mesh as mesh_lib
from diffsvc_tpu.training.task import SVCTask


def _hp():
    return HParams(
        audio_num_mel_bins=16, hidden_size=32, residual_layers=4,
        residual_channels=16, dilation_cycle_length=4, timesteps=20,
        K_step=20, diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=16, spec_min=[-6.0], spec_max=[1.5], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=False, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=50.0, f0_max=1100.0,
        lr=1e-3, scheduler="step_lr", decay_steps=100,
        optimizer_adam_beta1=0.9, optimizer_adam_beta2=0.98, weight_decay=0,
        clip_grad_norm=1, accumulate_grad_batches=1, seed=0,
    )


def _batch(b=4, t_mel=64, t_ph=32, h=32, m=16):
    rng = np.random.RandomState(0)
    mel2ph = np.clip((np.arange(t_mel)[None, :] * t_ph // t_mel) + 1, 1, t_ph
                     ).astype(np.int32) * np.ones((b, 1), np.int32)
    return {
        "hubert": rng.randn(b, t_ph, h).astype(np.float32) * 0.1,
        "mel2ph": mel2ph,
        "f0": np.full((b, t_mel), 7.78, np.float32),
        "uv": np.zeros((b, t_mel), np.float32),
        "energy": np.zeros((b, t_mel), np.float32),
        "mels": rng.randn(b, t_mel, m).astype(np.float32),
        "sample_mask": np.ones((b,), np.float32),
    }


def test_seq_parallel_matches_single_device():
    hp = _hp()
    batch = _batch()
    key = jax.random.PRNGKey(0)

    # single device
    task1 = SVCTask(hp, mesh=None)
    state1 = task1.init_state()
    state1, m1 = task1.train_step(state1, dict(batch), key)

    # (data=4, seq=2) mesh
    mesh = mesh_lib.make_mesh(("data", "seq"), shape=(4, 2))
    task2 = SVCTask(hp, mesh=mesh)
    state2 = task2.init_state()
    state2, m2 = task2.train_step(state2, dict(batch), key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-4)
    # params after one step agree
    l1 = jax.tree.leaves(state1["params"])
    l2 = jax.tree.leaves(state2["params"])
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_data_seq_mesh_shapes():
    mesh = mesh_lib.make_mesh(("data", "seq"), shape=(2, 4))
    assert mesh.shape == {"data": 2, "seq": 4}
    assert mesh_lib.data_parallel_world_size(mesh) == 2
