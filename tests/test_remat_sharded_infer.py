"""Rematerialization option and sharded (multi-chip) inference."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsvc_tpu.config import HParams
from diffsvc_tpu.models.diffusion import GaussianDiffusion
from diffsvc_tpu.parallel import mesh as mesh_lib


def _hp(**kw):
    hp = HParams(
        audio_num_mel_bins=16, hidden_size=32, residual_layers=4,
        residual_channels=16, dilation_cycle_length=4, timesteps=20,
        K_step=20, diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=16, spec_min=[-6.0], spec_max=[1.5], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=False, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=50.0, f0_max=1100.0,
        pndm_speedup=5)
    hp.update(kw)
    return hp


def _batch(b=2, t_mel=64, t_ph=32, h=32, m=16):
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
    }


def test_remat_same_loss_and_grads():
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}
    key = jax.random.PRNGKey(0)

    m1 = GaussianDiffusion(_hp())
    params = m1.init_params(jax.random.PRNGKey(0))
    m2 = GaussianDiffusion(_hp(use_remat=True))

    def loss(model):
        def f(p):
            return model.training_loss(p, batch, key)[0]
        return jax.value_and_grad(f)(params)

    l1, g1 = loss(m1)
    l2, g2 = loss(m2)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_sharded_inference_matches_single_device():
    """Sampling with batch/time-sharded inputs on an 8-device mesh must give
    the same mel as single-device execution (GSPMD propagates the input
    shardings through the whole scan-PLMS graph)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    hp = _hp()
    model = GaussianDiffusion(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    batch_np = _batch(b=2, t_mel=64)
    key = jax.random.PRNGKey(1)

    infer = jax.jit(lambda p, b, r: model.infer(p, b, r, speedup=5)["mel_out"])
    ref = np.asarray(infer(params, {k: jnp.asarray(v)
                                    for k, v in batch_np.items()}, key))

    mesh = mesh_lib.make_mesh(("data", "seq"), shape=(2, 4))
    spec3 = NamedSharding(mesh, P("data", "seq", None))
    spec2 = NamedSharding(mesh, P("data", "seq"))
    sharded = {
        "hubert": jax.device_put(batch_np["hubert"], spec3),
        "mels": jax.device_put(batch_np["mels"], spec3),
        "mel2ph": jax.device_put(batch_np["mel2ph"], spec2),
        "f0": jax.device_put(batch_np["f0"], spec2),
        "uv": jax.device_put(batch_np["uv"], spec2),
        "energy": jax.device_put(batch_np["energy"], spec2),
    }
    out = np.asarray(infer(params, sharded, key))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
