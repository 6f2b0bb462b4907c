"""Worker for tests/test_multiproc_distributed.py.

Runs 3 SVCTask train steps on an 8-device CPU mesh and dumps the losses +
full final params to an npz. Two modes, selected by the environment:

- distributed: JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
  set -> 2 real jax processes x 4 virtual devices each, exercising
  jax.distributed.initialize, the resume broadcast (sync_resume_state,
  including overwrite of a deliberately-corrupted non-0 process), and
  make_global_batch across a genuine process boundary.
- single: no env -> one process x 8 virtual devices, same code path the
  in-repo mesh tests use. The parent test asserts both produce BIT-IDENTICAL
  losses and parameters (same global mesh => same XLA program).

Usage: python _multiproc_worker.py <out.npz>
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def _hp():
    from diffsvc_tpu.config import HParams

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


def _batch(seed, b=8, t_mel=64, t_ph=32, h=32, m=16):
    rng = np.random.RandomState(seed)
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


def main(out_path):
    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.parallel import mesh as mesh_lib
    from diffsvc_tpu.training.task import SVCTask

    multi = mesh_lib.maybe_initialize_distributed(HParams())
    if os.environ.get("JAX_NUM_PROCESSES"):
        assert multi, "distributed init did not engage"
        assert jax.process_count() == int(os.environ["JAX_NUM_PROCESSES"])
    assert len(jax.devices()) == 8, jax.devices()

    mesh = mesh_lib.make_mesh(("data",))
    task = SVCTask(_hp(), mesh=mesh)
    state = task.init_state()
    pristine = jax.tree.map(np.asarray, state["params"])

    epoch, gstep, best = 0, 0, None
    if multi and jax.process_index() != 0:
        # Simulate a host that restored nothing / stale junk: the resume
        # broadcast must overwrite all of it with process 0's state.
        state["params"] = jax.tree.map(lambda x: x * 0 + 777.0,
                                       state["params"])
        epoch, gstep, best = 5, 999, 1.23
    state, epoch, gstep, best = mesh_lib.sync_resume_state(
        state, epoch, gstep, best, mesh)
    if multi:
        assert (epoch, gstep, best) == (0, 0, None), (epoch, gstep, best)
        for a, b in zip(jax.tree.leaves(state["params"]),
                        jax.tree.leaves(pristine)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    losses = []
    for step in range(3):
        state, metrics = task.train_step(state, _batch(seed=step),
                                         jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    print(f"| proc {jax.process_index()}: losses={losses}")

    # validation-plot path: full sampling runs on EVERY process over the
    # replicated batch (trainer._plot_validation multi-host contract);
    # process 0 reads the fully-replicated result.
    out = task.sample(state["params"], _batch(seed=99, b=2),
                      jax.random.PRNGKey(7), speedup=5)
    mel = np.asarray(out["mel_out"])
    assert np.all(np.isfinite(mel)), "non-finite sampled mel"

    if jax.process_index() == 0:
        flat = np.concatenate([np.asarray(x).ravel()
                               for x in jax.tree.leaves(state["params"])])
        np.savez(out_path, losses=np.asarray(losses), params=flat)
    if multi:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main(sys.argv[1])
