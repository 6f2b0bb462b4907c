"""ONNX chain at PRODUCTION dims and untraced lengths (VERDICT r3 #8).

tests/test_onnx_export.py proves the artifact chain at tiny dims; this
slow-marked sibling exports the real 44.1 kHz geometry (128 mel, 384ch x
20-layer DiffNet, K=1000) and drives the full exported chain — encoder,
denoiser ladder (PLMS and the dpmpp fast profile), after — through the
in-repo numpy ONNX runtime at lengths different from the traced ones,
asserting parity against model.infer.  acc=100 bounds the ladder to
10-11 denoiser evals so the numpy-runtime conv stack stays in CPU
minutes; per-step numerics are identical to the production acc=20 walk.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsvc_tpu.config import HParams

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytestmark = pytest.mark.slow

ACC = 100


def _prod_hp():
    return HParams(
        audio_num_mel_bins=128, hidden_size=256, residual_layers=20,
        residual_channels=384, dilation_cycle_length=4, timesteps=1000,
        K_step=1000, diff_loss_type="l2", schedule_type="linear",
        max_beta=0.02, keep_bins=128, spec_min=[-5.0], spec_max=[0.0],
        no_fs2=True, use_pitch_embed=True, use_energy_embed=False,
        use_uv=False, pitch_norm="log", f0_bin=256, f0_min=40.0,
        f0_max=1100.0, pndm_speedup=ACC, audio_sample_rate=44100,
        hop_size=512,
    )


@pytest.fixture(scope="module")
def prod_artifacts(tmp_path_factory):
    from diffsvc_tpu.models.diffusion import GaussianDiffusion
    from diffsvc_tpu.onnx.svc_export import export_dpmpp_onnx, export_svc_onnx

    hp = _prod_hp()
    model = GaussianDiffusion(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    out = tmp_path_factory.mktemp("onnx_prod")
    paths = export_svc_onnx(hp, params, str(out), "prod",
                            t_ph=10, t_mel=10)
    hp2 = hp.copy()
    hp2["sampler"] = "dpmpp"
    hp2["sampler_clip_x0"] = 1.0
    paths.update(export_dpmpp_onnx(hp2, str(out), "prod", speedup=ACC))
    return hp, hp2, model, params, paths


def _feats(hp, seed=21, t_ph=23, t_mel=57):
    rng = np.random.RandomState(seed)
    return {
        "hubert": (rng.randn(1, t_ph, hp["hidden_size"]) * 0.1
                   ).astype(np.float32),
        "mel2ph": rng.randint(1, t_ph + 1, (1, t_mel)).astype(np.int64),
        "f0": (rng.rand(1, t_mel) * 2 + 6).astype(np.float32),
        "noise": rng.randn(1, 1, hp["audio_num_mel_bins"],
                           t_mel).astype(np.float32),
    }


def test_prod_dims_plms_chain_untraced_length(prod_artifacts):
    from tools.run_onnx_chain import run_chain

    hp, _, model, params, paths = prod_artifacts
    art_dir = os.path.dirname(paths["encoder"])
    feats = _feats(hp)
    mel, f0_pred, wav = run_chain(art_dir, "prod", feats,
                                  k_step=hp["K_step"], acc=ACC)
    assert wav is None
    assert mel.shape == (1, 128, 57)

    batch = {"hubert": jnp.asarray(feats["hubert"]),
             "mel2ph": jnp.asarray(feats["mel2ph"], jnp.int32),
             "f0": jnp.asarray(feats["f0"])}
    out = model.infer(params, batch, jax.random.PRNGKey(0),
                      init_noise=jnp.asarray(
                          feats["noise"][:, 0].transpose(0, 2, 1)))
    want = np.asarray(out["mel_out"]).transpose(0, 2, 1) * np.log(10.0)
    np.testing.assert_allclose(mel, want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f0_pred),
                               np.asarray(out["f0_denorm"]),
                               rtol=1e-4, atol=1e-3)


def test_prod_dims_dpmpp_chain_untraced_length(prod_artifacts):
    from diffsvc_tpu.models.diffusion import GaussianDiffusion
    from tools.run_onnx_chain import run_chain

    hp, hp2, _, params, paths = prod_artifacts
    art_dir = os.path.dirname(paths["encoder"])
    feats = _feats(hp, seed=22, t_ph=19, t_mel=43)
    mel, _, _ = run_chain(art_dir, "prod", feats, k_step=hp["K_step"],
                          acc=ACC, sampler="dpmpp")
    assert mel.shape == (1, 128, 43)

    model2 = GaussianDiffusion(hp2)
    batch = {"hubert": jnp.asarray(feats["hubert"]),
             "mel2ph": jnp.asarray(feats["mel2ph"], jnp.int32),
             "f0": jnp.asarray(feats["f0"])}
    out = model2.infer(params, batch, jax.random.PRNGKey(0),
                       init_noise=jnp.asarray(
                           feats["noise"][:, 0].transpose(0, 2, 1)))
    want = np.asarray(out["mel_out"]).transpose(0, 2, 1) * np.log(10.0)
    np.testing.assert_allclose(mel, want, rtol=2e-4, atol=2e-4)
