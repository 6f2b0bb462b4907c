"""Multi-chip fused serving (VERDICT r2 #7): the batched fused graph
sharded over an 8-virtual-device data mesh must reproduce the single-device
batched output exactly (per-chunk numerics have no cross-chunk math, so
SPMD partitioning is a pure layout change)."""

import numpy as np
import pytest
from types import SimpleNamespace

import jax

from diffsvc_tpu.config import HParams
from diffsvc_tpu.infer.fused import FusedSvc
from diffsvc_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def fused():
    from diffsvc_tpu.models.diffusion import GaussianDiffusion
    from diffsvc_tpu.models import hubert as hub
    from diffsvc_tpu.vocoders import generator as gen

    hp = HParams(
        audio_sample_rate=8000, audio_num_mel_bins=16, fft_size=256,
        hop_size=64, win_size=256, fmin=30, fmax=4000, wav2spec_eps=1e-6,
        hidden_size=32, residual_layers=4, residual_channels=16,
        dilation_cycle_length=4, timesteps=20, K_step=20, diff_loss_type="l2",
        schedule_type="linear", max_beta=0.02, keep_bins=16,
        spec_min=[-6.0], spec_max=[1.5], no_fs2=True, use_pitch_embed=True,
        use_energy_embed=False, use_uv=False, pitch_norm="log", f0_bin=256,
        f0_min=50.0, f0_max=1100.0, pndm_speedup=5, vocoder="hifigan",
        mel_vmin=-6.0, mel_vmax=1.5, fused_bucket_samples=2048)
    model = GaussianDiffusion(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    hcfg = hub.HubertConfig(dim=32, num_heads=4, num_layers=1, ffn_dim=64,
                            proj_dim=32)
    hpar = hub.init(jax.random.PRNGKey(1), hcfg)
    vcfg = gen.HifiGanConfig(
        num_mels=16, upsample_initial_channel=32, upsample_rates=(4, 4, 4),
        upsample_kernel_sizes=(8, 8, 8), resblock="1",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        sampling_rate=8000, use_nsf=False)
    voc = SimpleNamespace(params=gen.init(jax.random.PRNGKey(2), vcfg),
                          cfg=vcfg)
    return FusedSvc(hp, params, voc, hubert_params=hpar, hubert_cfg=hcfg,
                    speedup=5)


def _chunks(n, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        ln = int(rng.randint(1800, 4000))
        t = np.arange(ln) / 8000
        out.append((0.3 * np.sin(2 * np.pi * (180 + 30 * i) * t))
                   .astype(np.float32))
    return out


def test_sharded_batched_matches_single_device(fused):
    mesh = mesh_lib.make_mesh(("data",))
    assert mesh.shape["data"] == 8
    wavs = _chunks(8)
    ref = fused.batched(wavs, rng=jax.random.PRNGKey(3), key_shifts=2)
    got = fused.batched_sharded(wavs, mesh, rng=jax.random.PRNGKey(3),
                                key_shifts=2)
    assert len(ref) == len(got) == 8
    for (rw, rf, rm), (gw, gf, gm) in zip(ref, got):
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(rf), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gm), np.asarray(rm), atol=1e-5)


def test_sharded_batched_pads_ragged_n(fused):
    """N not divisible by the data axis: padded with dummy chunks whose
    results are dropped; real chunks unchanged."""
    mesh = mesh_lib.make_mesh(("data",))
    wavs = _chunks(5, seed=1)
    ref = fused.batched(wavs, rng=jax.random.PRNGKey(4))
    got = fused.batched_sharded(wavs, mesh, rng=jax.random.PRNGKey(4))
    assert len(got) == 5
    for (rw, _, _), (gw, _, _) in zip(ref, got):
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-5)


def test_sharded_batched_istft_vocoder(fused):
    """The iSTFT-head vocoder family through the SHARDED batched fused
    graph: same single-device-vs-mesh exactness as the conv vocoder (its
    frame-rate matmuls carry no cross-chunk math either)."""
    from diffsvc_tpu.vocoders import istft_head as ih

    hp2 = HParams(**{**fused.hp, "vocoder": "istftvocoder", "use_nsf": True,
                     "istft_dim": 64, "istft_layers": 2})
    icfg = ih.IstftVocoderConfig.from_hparams(hp2)
    iparams = ih.init(jax.random.PRNGKey(9), icfg)
    fs = FusedSvc(hp2, fused.params,
                  SimpleNamespace(params=iparams, cfg=icfg),
                  hubert_params=fused.hub_params, hubert_cfg=fused.hub_cfg,
                  speedup=5)
    mesh = mesh_lib.make_mesh(("data",))
    wavs = _chunks(8, seed=2)
    ref = fs.batched(wavs, rng=jax.random.PRNGKey(5))
    got = fs.batched_sharded(wavs, mesh, rng=jax.random.PRNGKey(5))
    assert len(got) == 8
    for (rw, rf, rm), (gw, gf, gm) in zip(ref, got):
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gm), np.asarray(rm), atol=1e-5)
