"""Round trip: framework params -> reference torch ckpt -> converted back
must be bit-identical, and the torch ckpt must drive the same forward."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsvc_tpu.config import HParams
from diffsvc_tpu.models.diffusion import GaussianDiffusion
from diffsvc_tpu.utils import convert_torch as cvt
from diffsvc_tpu.utils.export_reference import export_gaussian_diffusion


def test_reference_ckpt_roundtrip(tmp_path):
    hp = HParams(
        audio_num_mel_bins=8, hidden_size=16, residual_layers=4,
        residual_channels=16, dilation_cycle_length=4, timesteps=10,
        K_step=10, diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=8, spec_min=[-6.0], spec_max=[1.5], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=True, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=50.0, f0_max=1100.0,
        pndm_speedup=0,
    )
    model = GaussianDiffusion(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    out = str(tmp_path / "model_ckpt_steps_42.ckpt")
    export_gaussian_diffusion(params, hp, out, epoch=1, global_step=42)

    back = cvt.convert_gaussian_diffusion(out, hp)

    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(jax.tree.map(jnp.asarray, back))
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # forward equality through the converted params
    batch = {
        "hubert": jnp.ones((1, 4, 16)) * 0.1,
        "mel2ph": jnp.ones((1, 8), jnp.int32),
        "f0": jnp.full((1, 8), 7.78),
        "uv": jnp.zeros((1, 8)),
        "energy": jnp.full((1, 8), 0.5),
        "mels": jnp.zeros((1, 8, 8)),
    }
    l1, _ = model.training_loss(params, batch, jax.random.PRNGKey(1))
    l2, _ = model.training_loss(back, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
