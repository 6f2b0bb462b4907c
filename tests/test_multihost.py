"""Multi-host plumbing (single-controller, 8 virtual devices).

True multi-process JAX needs a coordinator + N processes; what we CAN test
here is the exact code path multi-host runs through: global jax.Array
assembly via ``make_array_from_callback`` (``force=True`` takes the
process_count>1 branch on one process) must be numerically identical to the
numpy + ``in_shardings`` path, and the distributed init must be a no-op
when unconfigured. Reference parity: NCCL process group + rank-sharded
sampler (training/task/base_task.py:254-268, tts.py:85-88).
"""

import jax
import jax.numpy as jnp
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


def _batch(b=8, t_mel=64, t_ph=32, h=32, m=16):
    rng = np.random.RandomState(0)
    mel2ph = np.clip((np.arange(t_mel)[None, :] * t_ph // t_mel) + 1, 1, t_ph
                     ).astype(np.int32) * np.ones((b, 1), np.int32)
    return {
        "hubert": rng.randn(b, t_ph, h).astype(np.float32) * 0.1,
        "mel2ph": mel2ph,
        "f0": np.full((b, t_mel), np.log2(220.0), np.float32),
        "uv": np.zeros((b, t_mel), np.float32),
        "energy": np.zeros((b, t_mel), np.float32),
        "mels": rng.randn(b, t_mel, m).astype(np.float32),
    }


def test_maybe_initialize_distributed_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert mesh_lib.maybe_initialize_distributed(HParams()) is False
    assert jax.process_count() == 1


def test_global_array_assembly_matches_numpy_path():
    mesh = mesh_lib.make_mesh(("data",))
    task = SVCTask(_hp(), mesh=mesh)
    batch = _batch(b=8)
    rng = jax.random.PRNGKey(0)

    # numpy + in_shardings path (what a single host does)
    s1, m1 = task.train_step(task.init_state(), dict(batch), rng)

    # the multi-host path: state and batch globalized via
    # make_array_from_callback, then the same jitted step
    gstate = mesh_lib.make_global_tree(task.init_state(), mesh, force=True)
    jb = task.prepare_batch(dict(batch))
    jb["sample_mask"] = jnp.ones((8,), jnp.float32)
    jb = {k: jb[k] for k in task._batch_keys}
    jb = mesh_lib.make_global_batch(jb, task.batch_shardings(), force=True)
    s2, m2 = task._train_step(gstate, jb, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    p1 = jax.tree.leaves(s1["params"])
    p2 = jax.tree.leaves(s2["params"])
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_val_step_on_globalized_replicated_batch():
    """The multi-host validation path: a fully-replicated global batch fed
    to the bare-jit val step must match the numpy-batch loss."""
    mesh = mesh_lib.make_mesh(("data",))
    task = SVCTask(_hp(), mesh=mesh)
    params = task.init_state()["params"]
    batch = _batch(b=2)
    rng = jax.random.PRNGKey(3)
    l1 = float(task.val_step(params, dict(batch), rng))

    jb = task.prepare_batch(dict(batch), shard=False)
    repl = mesh_lib.replicated(mesh)
    jb = mesh_lib.make_global_batch(jb, {k: repl for k in jb}, force=True)
    l2 = float(task._val_step(params, jb, rng))
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


def test_make_global_batch_passes_non_array_keys():
    mesh = mesh_lib.make_mesh(("data",))
    sh = {"x": mesh_lib.batch_sharding(mesh)}
    out = mesh_lib.make_global_batch(
        {"x": np.ones((8, 4), np.float32), "n": 8}, sh, force=True)
    assert out["n"] == 8
    assert isinstance(out["x"], jax.Array)
    assert out["x"].sharding.is_equivalent_to(sh["x"], 2)
