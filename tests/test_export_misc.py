import os

import jax
import jax.numpy as jnp
import numpy as np

from diffsvc_tpu.config import HParams

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_hp():
    return HParams(
        audio_num_mel_bins=8, hidden_size=16, residual_layers=4,
        residual_channels=16, dilation_cycle_length=4, timesteps=20,
        K_step=20, diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=8, spec_min=[-6.0], spec_max=[1.5], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=False, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=50.0, f0_max=1100.0,
        pndm_speedup=5, audio_sample_rate=8000,
    )


def test_stablehlo_export_roundtrip(tmp_path):
    from diffsvc_tpu.infer.export import SvcExporter, load_exported
    from diffsvc_tpu.models.diffusion import GaussianDiffusion

    hp = _tiny_hp()
    model = GaussianDiffusion(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    exporter = SvcExporter(hp, params)
    paths = exporter.export(str(tmp_path), t_mel=32, t_ph=16)
    assert set(paths) == {"encoder", "denoiser", "sampler"}

    # reload the denoiser artifact and check it matches direct execution
    den = load_exported(paths["denoiser"])
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 8), jnp.float32)
    t = jnp.array([3], jnp.int32)
    cond = jnp.asarray(np.random.RandomState(1).randn(1, 32, 16), jnp.float32)
    got = den(x, t, cond)
    expect = model._dec.apply(params["denoise_fn"], model.net_cfg, x, t, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)

    # sampler artifact runs end to end
    samp = load_exported(paths["sampler"])
    noise = jnp.asarray(np.random.RandomState(2).randn(1, 32, 8), jnp.float32)
    mel = samp(cond, noise)
    assert mel.shape == (1, 32, 8)
    assert np.isfinite(np.asarray(mel)).all()


def test_ssim_properties():
    from diffsvc_tpu.ops.ssim import ssim

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(2, 32, 16), jnp.float32)
    # identical images -> ssim 1
    np.testing.assert_allclose(float(ssim(a, a)), 1.0, atol=1e-4)
    # uncorrelated noise -> much lower
    b = jnp.asarray(rng.rand(2, 32, 16), jnp.float32)
    assert float(ssim(a, b)) < 0.5


def test_mel_losses_parse_spec():
    from diffsvc_tpu.training.losses import mel_losses

    rng = np.random.RandomState(0)
    tgt = jnp.asarray(rng.rand(1, 16, 8), jnp.float32)
    out = mel_losses(tgt, tgt, "ssim:0.5|l1:0.5")
    assert set(out) == {"ssim", "l1"}
    assert float(out["l1"]) == 0.0
    assert float(out["ssim"]) < 1e-4


def test_contentvec_converter_shapes():
    """Build a fairseq-format state dict with tiny dims and check the
    converter produces a working trunk with the layer-9 tap."""
    import torch

    from diffsvc_tpu.models import contentvec, hubert as hub

    dim, ffn, heads, layers = 32, 64, 4, 10
    g = torch.Generator().manual_seed(0)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {}
    specs = [(10, 5), (3, 2), (3, 2), (3, 2), (3, 2), (2, 2), (2, 2)]
    c_in = 1
    for i, (k, s) in enumerate(specs):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = r(512, c_in, k)
        c_in = 512
    sd["feature_extractor.conv_layers.0.2.weight"] = torch.ones(512)
    sd["feature_extractor.conv_layers.0.2.bias"] = torch.zeros(512)
    sd["layer_norm.weight"] = torch.ones(512)
    sd["layer_norm.bias"] = torch.zeros(512)
    sd["post_extract_proj.weight"] = r(dim, 512)
    sd["post_extract_proj.bias"] = torch.zeros(dim)
    sd["encoder.pos_conv.0.weight_g"] = torch.ones(1, 1, 128)
    sd["encoder.pos_conv.0.weight_v"] = r(dim, dim // 16, 128)
    sd["encoder.pos_conv.0.bias"] = torch.zeros(dim)
    sd["encoder.layer_norm.weight"] = torch.ones(dim)
    sd["encoder.layer_norm.bias"] = torch.zeros(dim)
    for i in range(layers):
        p = f"encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = r(dim, dim)
            sd[f"{p}.self_attn.{proj}.bias"] = torch.zeros(dim)
        sd[f"{p}.self_attn_layer_norm.weight"] = torch.ones(dim)
        sd[f"{p}.self_attn_layer_norm.bias"] = torch.zeros(dim)
        sd[f"{p}.fc1.weight"] = r(ffn, dim)
        sd[f"{p}.fc1.bias"] = torch.zeros(ffn)
        sd[f"{p}.fc2.weight"] = r(dim, ffn)
        sd[f"{p}.fc2.bias"] = torch.zeros(dim)
        sd[f"{p}.final_layer_norm.weight"] = torch.ones(dim)
        sd[f"{p}.final_layer_norm.bias"] = torch.zeros(dim)
    sd["final_proj.weight"] = r(16, dim)
    sd["final_proj.bias"] = torch.zeros(16)

    sd_np = {k: v.numpy() for k, v in sd.items()}
    cfg = hub.HubertConfig(dim=dim, num_heads=heads, num_layers=layers,
                           ffn_dim=ffn, proj_dim=16)
    params = contentvec.convert_fairseq(sd_np, cfg)
    wav = jnp.zeros((1, 16000 // 4))
    u = contentvec.units(params, cfg, wav)
    assert u.shape[0] == 1 and u.shape[2] == 16
    assert np.isfinite(np.asarray(u)).all()


def test_run_exported_cli_matches_inprocess(tmp_path):
    """tools/run_exported.py (the doc/export.md consumption example) must
    reproduce the in-process chain from the serialized artifacts alone."""
    import os
    import runpy
    import sys

    from diffsvc_tpu.infer.export import SvcExporter
    from diffsvc_tpu.models.diffusion import GaussianDiffusion

    hp = _tiny_hp()
    model = GaussianDiffusion(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    export_dir = tmp_path / "exported"
    SvcExporter(hp, params).export(str(export_dir), t_mel=32, t_ph=16)

    rng = np.random.RandomState(0)
    t_mel, t_ph = 32, 16
    mel2ph = np.clip((np.arange(t_mel) * t_ph // t_mel) + 1, 1,
                     t_ph)[None, :].astype(np.int32)
    feats = dict(
        hubert=(rng.randn(1, t_ph, 16) * 0.1).astype(np.float32),
        mel2ph=mel2ph,
        f0=np.full((1, t_mel), np.log2(220.0), np.float32),
        uv=np.zeros((1, t_mel), np.float32),
        energy=np.zeros((1, t_mel), np.float32),
        noise=rng.randn(1, t_mel, 8).astype(np.float32),
    )
    np.savez(tmp_path / "feats.npz", **feats)

    out_dir = tmp_path / "out"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    argv, sys.argv = sys.argv, [
        "run_exported.py", "--export_dir", str(export_dir),
        "--features", str(tmp_path / "feats.npz"), "--out", str(out_dir)]
    try:
        runpy.run_path(os.path.join(repo, "tools", "run_exported.py"),
                       run_name="__main__")
    finally:
        sys.argv = argv

    mel_cli = np.load(out_dir / "mel.npy")
    batch = {k: jnp.asarray(v) for k, v in feats.items() if k != "noise"}
    out = model.infer(params, batch, jax.random.PRNGKey(0),
                      init_noise=jnp.asarray(feats["noise"]))
    np.testing.assert_allclose(mel_cli, np.asarray(out["mel_out"]),
                               rtol=1e-5, atol=1e-5)


def test_export_fused_bitexact_and_cli(tmp_path):
    """VERDICT r2 #8: the single-dispatch fused program exported per bucket
    must reproduce the in-process FusedSvc output bit-for-bit, both via
    load_exported and via the standalone tools/run_exported.py --fused
    consumer (raw wav in, converted wav out, no model code)."""
    import runpy
    import sys
    from types import SimpleNamespace

    import jax
    from diffsvc_tpu.infer.export import export_fused, load_exported
    from diffsvc_tpu.infer.fused import FusedSvc
    from diffsvc_tpu.models import hubert as hub
    from diffsvc_tpu.models.diffusion import GaussianDiffusion
    from diffsvc_tpu.vocoders import generator as gen

    hp = HParams(
        audio_sample_rate=8000, audio_num_mel_bins=16, fft_size=256,
        hop_size=64, win_size=256, fmin=30, fmax=4000, wav2spec_eps=1e-6,
        hidden_size=32, residual_layers=4, residual_channels=16,
        dilation_cycle_length=4, timesteps=20, K_step=20,
        diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=16, spec_min=[-6.0], spec_max=[1.5], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=False, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=50.0, f0_max=1100.0,
        pndm_speedup=5, vocoder="hifigan", mel_vmin=-6.0, mel_vmax=1.5,
        fused_bucket_samples=2048)
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
    fs = FusedSvc(hp, params, voc, hubert_params=hpar, hubert_cfg=hcfg,
                  speedup=5)

    t = np.arange(3000) / 8000
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    key = jax.random.PRNGKey(9)
    ref_w, ref_f0, ref_m = fs(wav, rng=key, key_shift=2)

    n44 = 4096  # the bucket fs() used for a 3000-sample input
    path = export_fused(fs, str(tmp_path / "exp"), n44)
    fn = load_exported(path)
    wav_in = np.zeros((n44,), np.float32)
    wav_in[: len(wav)] = wav
    got_w, got_f0, got_m = fn(wav_in, np.asarray(key, np.uint32),
                              np.float32(2.0), np.int32(0))
    np.testing.assert_array_equal(np.asarray(got_w)[: len(ref_w)],
                                  np.asarray(ref_w))
    np.testing.assert_array_equal(np.asarray(got_m)[: ref_m.shape[0]],
                                  np.asarray(ref_m))

    # standalone CLI consumer
    np.save(tmp_path / "in.npy", wav)
    argv = sys.argv
    sys.argv = ["run_exported.py", "--export_dir", str(tmp_path / "exp"),
                "--features", str(tmp_path / "in.npy"),
                "--out", str(tmp_path / "out"), "--fused", "--key", "2",
                "--seed", "9"]  # CLI key = [0, seed]; PRNGKey(9) == [0, 9]
    try:
        runpy.run_path(os.path.join(REPO_ROOT, "tools/run_exported.py"),
                       run_name="__main__")
    finally:
        sys.argv = argv
    cli_w = np.load(tmp_path / "out" / "wav.npy")
    np.testing.assert_array_equal(cli_w[: len(ref_w)], np.asarray(ref_w))
