"""End-to-end parity against the REFERENCE'S OWN torch implementation.

This is the anti-regression gate VERDICT.md round 1 asked for: load one
checkpoint into BOTH the reference chain (imported from /root/reference,
run under torch CPU) and this repo's JAX chain, drive both PLMS ladders
with identical Gaussian noise, and assert the mel delta / mel-MCD bound
(BASELINE.md target: mel-MCD < 0.5 dB; measured here at fp32 tolerance).
Same for the HiFi-GAN waveform.

The reference model layer needs no librosa when fed tensors directly; the
module-level ``import librosa`` / ``from pycwt import wavelet`` in
utils/pitch_utils.py / utils/cwt.py are satisfied with stubs (none of the
functions on this path call them).

Reference chain exercised: network/diff/diffusion.py:227-284 (forward,
infer=True, PLMS ladder :165-198) -> modules/fastspeech/fs2.py:98-148
(no_fs2 conditioning) and modules/hifigan/hifigan.py:104-178 (generator).
"""

import importlib.util
import os
import sys
import types
import unittest.mock as mock

import numpy as np
import pytest
import torch

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present")

MEL_BINS = 16
HID = 256
RES_CH = 32
LAYERS = 4
K = 40          # timesteps = K_step
SPEEDUP = 10    # PLMS interval -> 4 denoise steps

HP = dict(
    audio_num_mel_bins=MEL_BINS, hidden_size=HID,
    residual_layers=LAYERS, residual_channels=RES_CH,
    dilation_cycle_length=4, timesteps=K, K_step=K,
    diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
    keep_bins=MEL_BINS, spec_min=[-6.0], spec_max=[1.5],
    no_fs2=True, use_pitch_embed=True, use_energy_embed=False,
    use_spk_id=False, use_spk_embed=False, use_uv=False, use_split_spk_id=False,
    pitch_type="frame", pitch_norm="log", f0_bin=256, f0_min=50.0,
    f0_max=1100.0, predictor_hidden=-1, predictor_layers=2,
    predictor_dropout=0.5, predictor_kernel=5, predictor_grad=0.1,
    ffn_padding="SAME", pndm_speedup=SPEEDUP, audio_sample_rate=8000,
    hop_size=64, use_nsf=False,
)

VOC_H = dict(
    resblock="1", resblock_kernel_sizes=[3],
    resblock_dilation_sizes=[[1, 3, 5]],  # ResBlock1 hard-codes 3 dilations
    upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
    upsample_initial_channel=16, use_pitch_embed=False,
    audio_sample_rate=8000, audio_num_mel_bins=80, num_mels=80,
)


def _load_tool(name, fname):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference model layer with its global hparams populated
    (several modules read hparams at import time, e.g. diffusion.py:40,69)."""
    import scipy.signal
    kaiser_shim = not hasattr(scipy.signal, "kaiser")
    if kaiser_shim:  # removed in scipy>=1.13; pqmf.py still imports it
        scipy.signal.kaiser = scipy.signal.windows.kaiser
    stubbed = []
    for name in ("librosa", "pycwt"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            if name == "pycwt":
                m.wavelet = types.SimpleNamespace()
            sys.modules[name] = m
            stubbed.append(name)
    sys.path.insert(0, REF)
    added = []
    try:
        import utils.hparams as ref_hparams_mod  # reference module
        ref_hparams_mod.hparams.clear()
        ref_hparams_mod.hparams.update(HP)
        before = set(sys.modules)
        from modules.hifigan.hifigan import HifiGanGenerator
        from modules.parallel_wavegan.models.melgan import (
            MelGANMultiScaleDiscriminator)
        from network.diff.diffusion import GaussianDiffusion as RefDiffusion
        from network.diff.net import DiffNet as RefDiffNet
        added = [k for k in sys.modules if k not in before]
        yield types.SimpleNamespace(
            hparams=ref_hparams_mod.hparams,
            RefDiffusion=RefDiffusion, RefDiffNet=RefDiffNet,
            HifiGanGenerator=HifiGanGenerator,
            MelGANMultiScaleDiscriminator=MelGANMultiScaleDiscriminator)
    finally:
        sys.path.remove(REF)
        for k in added + ["utils.hparams", "utils"] + stubbed:
            sys.modules.pop(k, None)
        if kaiser_shim:
            del scipy.signal.kaiser


def _make_inputs(t_ph=25, t_mel=64, seed=0):
    rng = np.random.RandomState(seed)
    hubert = (rng.randn(1, t_ph, HID) * 0.1).astype(np.float32)
    mel2ph = np.clip((np.arange(t_mel) * t_ph // t_mel) + 1, 1, t_ph)
    mel2ph = mel2ph[None, :].astype(np.int64)
    f0 = np.full((1, t_mel), np.log2(220.0), np.float32)
    f0 += (rng.randn(1, t_mel) * 0.05).astype(np.float32)
    uv = np.zeros((1, t_mel), np.float32)
    noise = rng.randn(1, t_mel, MEL_BINS).astype(np.float32)
    return hubert, mel2ph, f0, uv, noise


def test_plms_mel_parity(ref_modules, tmp_path):
    """Same ckpt + same x_T noise -> reference torch PLMS ladder and the JAX
    scan ladder must produce the same mel (fp32 tolerance; MCD ~ 0)."""
    import jax
    import jax.numpy as jnp

    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.models.diffusion import GaussianDiffusion
    from diffsvc_tpu.utils.convert_torch import convert_gaussian_diffusion

    torch.manual_seed(0)
    ref_dn = ref_modules.RefDiffNet(MEL_BINS)
    ref_model = ref_modules.RefDiffusion(
        phone_encoder=None, out_dims=MEL_BINS, denoise_fn=ref_dn,
        timesteps=K, K_step=K, loss_type="l2",
        spec_min=HP["spec_min"], spec_max=HP["spec_max"])
    ref_model.eval()

    # Share weights by exporting the reference model's own random init in
    # trainer-ckpt format and running it through the repo converter.
    ckpt = tmp_path / "model_ckpt_steps_1000.ckpt"
    sd = {f"model.{k}": v for k, v in ref_model.state_dict().items()}
    torch.save({"state_dict": sd, "epoch": 0, "global_step": 1000}, str(ckpt))

    hp = HParams(**HP)
    jmodel = GaussianDiffusion(hp)
    params = convert_gaussian_diffusion(str(ckpt), hp)
    ref_modules.hparams["pndm_speedup"] = SPEEDUP  # reference reads the global

    hubert, mel2ph, f0, uv, noise = _make_inputs()

    with torch.no_grad(), mock.patch.object(
            torch, "randn",
            lambda *a, **k: torch.from_numpy(
                np.transpose(noise, (0, 2, 1))[:, None])):  # [B,1,M,T]
        ret = ref_model(
            torch.from_numpy(hubert), mel2ph=torch.from_numpy(mel2ph),
            spk_embed=None, ref_mels=None, f0=torch.from_numpy(f0),
            uv=torch.from_numpy(uv), energy=None, infer=True)
    mel_ref = ret["mel_out"].numpy()[0]  # [T, M]

    batch = {"hubert": jnp.asarray(hubert),
             "mel2ph": jnp.asarray(mel2ph.astype(np.int32)),
             "f0": jnp.asarray(f0), "uv": jnp.asarray(uv), "energy": None}
    out = jmodel.infer(params, batch, jax.random.PRNGKey(0),
                       speedup=SPEEDUP, init_noise=jnp.asarray(noise))
    mel_jax = np.asarray(out["mel_out"])[0]

    compare_mel = _load_tool("compare_mel", "compare_mel.py")
    mcd = compare_mel.mel_mcd(mel_ref, mel_jax)
    max_abs = float(np.max(np.abs(mel_ref - mel_jax)))
    print(f"\n| e2e PLMS parity: mel-MCD={mcd:.6f} dB  max|d|={max_abs:.2e}")
    assert max_abs < 5e-4, max_abs
    assert mcd < 0.01, mcd  # target in BASELINE.md is < 0.5 dB


def test_ddpm_mel_parity(ref_modules, tmp_path):
    """DDPM (speedup=1) ladder parity with shared per-step noise: the
    reference draws noise via noise_like (diffusion.py:156-163); feed both
    sides the same deterministic sequence."""
    import jax
    import jax.numpy as jnp

    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.models import diffusion as jdiff
    from diffsvc_tpu.utils.convert_torch import convert_gaussian_diffusion

    torch.manual_seed(1)
    ref_dn = ref_modules.RefDiffNet(MEL_BINS)
    ref_model = ref_modules.RefDiffusion(
        phone_encoder=None, out_dims=MEL_BINS, denoise_fn=ref_dn,
        timesteps=K, K_step=K, loss_type="l2",
        spec_min=HP["spec_min"], spec_max=HP["spec_max"])
    ref_model.eval()
    ckpt = tmp_path / "model_ckpt_steps_1000.ckpt"
    sd = {f"model.{k}": v for k, v in ref_model.state_dict().items()}
    torch.save({"state_dict": sd, "epoch": 0, "global_step": 1000}, str(ckpt))

    hp = HParams(**{**HP, "pndm_speedup": 1})
    jmodel = jdiff.GaussianDiffusion(hp)
    params = convert_gaussian_diffusion(str(ckpt), hp)
    ref_modules.hparams["pndm_speedup"] = 1  # reference reads the global

    hubert, mel2ph, f0, uv, noise = _make_inputs(seed=1)
    t_mel = f0.shape[1]
    rng = np.random.RandomState(7)
    # One draw for x_T + one per DDPM step (steps t>0 use it; t==0 masks it).
    step_noises = rng.randn(K, 1, t_mel, MEL_BINS).astype(np.float32)

    draws = iter([np.transpose(noise, (0, 2, 1))[:, None]] +
                 [np.transpose(n, (0, 2, 1))[:, None] for n in step_noises[::-1]])
    with torch.no_grad(), mock.patch.object(
            torch, "randn", lambda *a, **k: torch.from_numpy(next(draws))):
        ret = ref_model(
            torch.from_numpy(hubert), mel2ph=torch.from_numpy(mel2ph),
            spk_embed=None, ref_mels=None, f0=torch.from_numpy(f0),
            uv=torch.from_numpy(uv), energy=None, infer=True)
    mel_ref = ret["mel_out"].numpy()[0]

    # JAX side: replicate the ancestral ladder from the public tables with
    # the injected noise sequence (mirrors p_sample_ddpm_scan's body, which
    # itself mirrors reference p_sample/p_mean_variance diffusion.py:125-163).
    tables = jmodel.tables
    from diffsvc_tpu.models.fs2 import apply as fs2_apply
    ret_j = fs2_apply(params["fs2"], jmodel.fs2_cfg, jnp.asarray(hubert),
                      jnp.asarray(mel2ph.astype(np.int32)), jnp.asarray(f0),
                      jnp.asarray(uv), None, None)
    cond = ret_j["decoder_inp"]
    denoise_fn = jmodel._denoise_closure(params, cond, hoist_cond=True)
    x = jnp.asarray(noise)
    for i, t in enumerate(reversed(range(K))):
        tvec = jnp.full((1,), t, dtype=jnp.int32)
        eps = denoise_fn(x, tvec)
        x_recon = (tables["sqrt_recip_alphas_cumprod"][t] * x
                   - tables["sqrt_recipm1_alphas_cumprod"][t] * eps)
        x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean = (tables["posterior_mean_coef1"][t] * x_recon
                + tables["posterior_mean_coef2"][t] * x)
        log_var = tables["posterior_log_variance_clipped"][t]
        nz = jnp.asarray(step_noises[K - 1 - i]) if t > 0 else jnp.zeros_like(x)
        x = mean + jnp.exp(0.5 * log_var) * nz
    mel = jdiff.denorm_spec(x, jmodel.spec_min, jmodel.spec_max)
    mel = mel * (jnp.asarray(mel2ph) > 0).astype(mel.dtype)[:, :, None]
    mel_jax = np.asarray(mel)[0]

    max_abs = float(np.max(np.abs(mel_ref - mel_jax)))
    print(f"\n| e2e DDPM parity: max|d|={max_abs:.2e}")
    assert max_abs < 1e-3, max_abs


def test_hifigan_waveform_parity(ref_modules, tmp_path):
    """Reference HifiGanGenerator (conv_pre is hard-coded to 80 mel bins,
    modules/hifigan/hifigan.py:118) vs the JAX generator on one folded
    checkpoint -> same waveform."""
    import jax.numpy as jnp

    from diffsvc_tpu.utils.convert_torch import convert_hifigan_generator
    from diffsvc_tpu.vocoders import generator as jgen

    torch.manual_seed(2)
    ref_g = ref_modules.HifiGanGenerator(VOC_H)
    ref_g.eval()
    ref_g.remove_weight_norm()
    sd = {k: v.numpy() for k, v in ref_g.state_dict().items()}

    cfg = jgen.HifiGanConfig.from_dict(VOC_H)
    params = convert_hifigan_generator(
        {k: torch.as_tensor(v) for k, v in sd.items()}, cfg)

    rng = np.random.RandomState(3)
    mel = (rng.randn(1, 48, 80) * 0.5).astype(np.float32)
    with torch.no_grad():
        wav_ref = ref_g(torch.from_numpy(np.transpose(mel, (0, 2, 1))))
    wav_ref = wav_ref.numpy()[0, 0]

    wav_jax = np.asarray(jgen.apply(params, cfg, jnp.asarray(mel)))[0]

    max_abs = float(np.max(np.abs(wav_ref - wav_jax)))
    print(f"\n| e2e HiFi-GAN waveform parity: max|d|={max_abs:.2e}")
    assert wav_ref.shape == wav_jax.shape
    assert max_abs < 2e-5, max_abs


def test_melgan_multiscale_discriminator_parity(ref_modules):
    """Reference MelGANMultiScaleDiscriminator (melgan.py:317-413) vs the
    JAX port on one converted (weight-norm-folded) state dict: every layer
    output of every scale must match."""
    import jax.numpy as jnp

    from diffsvc_tpu.vocoders import melgan as jmg

    torch.manual_seed(4)
    ref_d = ref_modules.MelGANMultiScaleDiscriminator(
        channels=8, max_downsample_channels=64,
        downsample_scales=[4, 4], scales=2)
    ref_d.eval()
    cfg = jmg.MelGANDiscriminatorConfig(
        channels=8, max_downsample_channels=64,
        downsample_scales=(4, 4), scales=2)
    params = jmg.convert_multiscale_discriminator(
        {k: v.numpy() for k, v in ref_d.state_dict().items()}, cfg)

    rng = np.random.RandomState(5)
    wav = (rng.randn(1, 1, 1024) * 0.3).astype(np.float32)
    with torch.no_grad():
        outs_ref = ref_d(torch.from_numpy(wav))
    outs_jax = jmg.apply_multiscale_discriminator(
        params, cfg, jnp.asarray(wav[:, 0, :]))

    assert len(outs_ref) == len(outs_jax) == 2
    for scale_ref, scale_jax in zip(outs_ref, outs_jax):
        assert len(scale_ref) == len(scale_jax)
        for a, b in zip(scale_ref, scale_jax):
            a = a.numpy().transpose(0, 2, 1)  # [B,C,T] -> [B,T,C]
            b = np.asarray(b)
            assert a.shape == b.shape, (a.shape, b.shape)
            np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)
