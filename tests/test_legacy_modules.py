"""Legacy/aux modules: text encoder, MelGAN, source variants, VAD trim,
OfflineGaussianDiffusion."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsvc_tpu.utils.text_encoder import PAD_ID, TokenTextEncoder


def test_token_text_encoder_roundtrip():
    enc = TokenTextEncoder(["a", "b", "c"], replace_oov="|")
    assert enc.vocab_size == 6  # 3 reserved + 3
    ids = enc.encode("a c b")
    assert enc.decode(ids) == "a c b"
    assert enc.pad() == PAD_ID
    # oov replaced only if '|' in vocab; here it maps through replace_oov
    enc2 = TokenTextEncoder(["a", "|"], replace_oov="|")
    assert enc2.decode(enc2.encode("a zz")) == "a |"
    # strip padding
    assert enc.decode([PAD_ID] + enc.encode("a"), strip_padding=True) == "a"


def test_melgan_generator_shapes():
    from diffsvc_tpu.vocoders import melgan

    cfg = melgan.MelGANConfig(in_channels=16, channels=64,
                              upsample_scales=(4, 4, 2), stacks=2)
    params = melgan.init(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(np.random.RandomState(0).randn(1, 20, 16), jnp.float32)
    wav = melgan.apply(params, cfg, mel)
    assert wav.shape == (1, 20 * 32)
    assert np.isfinite(np.asarray(wav)).all()


def test_pulse_gen():
    from diffsvc_tpu.vocoders.source import pulse_gen

    sr = 8000
    f0 = jnp.full((1, sr), 100.0)
    pulses, uv, _ = pulse_gen(jax.random.PRNGKey(0), f0, sr, noise_std=0.0)
    p = np.asarray(pulses[0])
    # ~100 pulses per second
    assert abs((p > 0.05).sum() - 100) <= 3
    assert np.asarray(uv).min() == 1.0


def test_cyclic_noise_gen():
    from diffsvc_tpu.vocoders.source import cyclic_noise_gen

    sr = 8000
    f0 = jnp.concatenate([jnp.full((1, sr // 2), 100.0),
                          jnp.zeros((1, sr // 2))], axis=1)
    sig, uv = cyclic_noise_gen(jax.random.PRNGKey(0), f0, sr)
    s = np.asarray(sig[0])
    assert np.isfinite(s).all()
    # reference semantics: ONE fixed decayed-noise kernel repeats at every
    # pulse, so the voiced part is strongly periodic at the f0 period...
    v = s[: sr // 2]
    period = sr // 100
    ac = np.corrcoef(v[:-period], v[period:])[0, 1]
    assert ac > 0.5, ac
    # ...while the unvoiced part is plain iid noise at the noise_std scale
    u = s[sr // 2:]
    assert abs(u.std() - 0.003) < 0.001, u.std()
    ac_u = np.corrcoef(u[:-period], u[period:])[0, 1]
    assert abs(ac_u) < 0.2, ac_u


def test_trim_long_silences():
    from diffsvc_tpu.utils.audio_io import trim_long_silences

    sr = 24000
    wav = np.concatenate([np.zeros(sr * 2, np.float32),
                          0.5 * np.ones(sr, np.float32),
                          np.zeros(sr * 2, np.float32)])
    trimmed, mask = trim_long_silences(wav, sr)
    assert len(trimmed) < len(wav)
    # the voiced second survives fully
    assert mask[sr * 2: sr * 3].all()


def test_offline_gaussian_diffusion():
    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.models.diffusion import OfflineGaussianDiffusion

    hp = HParams(
        audio_num_mel_bins=8, hidden_size=16, residual_layers=4,
        residual_channels=16, dilation_cycle_length=4, timesteps=10,
        K_step=10, diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=8, spec_min=[-6.0], spec_max=[1.5], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=False, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=50.0, f0_max=1100.0,
        pndm_speedup=5, gaussian_start=False)
    model = OfflineGaussianDiffusion(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = {
        "hubert": jnp.ones((1, 4, 16)) * 0.1,
        "mel2ph": jnp.ones((1, 8), jnp.int32),
        "f0": jnp.full((1, 8), 7.78),
        "uv": jnp.zeros((1, 8)),
        "energy": jnp.zeros((1, 8)),
        "mels": jnp.zeros((1, 8, 8)),
        "fs2_mels": jnp.full((1, 8, 8), -3.0),
    }
    out = model.infer(params, batch, jax.random.PRNGKey(1))
    assert out["mel_out"].shape == (1, 8, 8)
    assert np.isfinite(np.asarray(out["mel_out"])).all()


def test_melgan_causal_mode_parity():
    """use_causal_conv (reference melgan.py:36/64-128 + causal_conv.py):
    parity vs an independent torch causal build sharing the same weights."""
    import math

    import torch
    import torch.nn as tnn

    from diffsvc_tpu.vocoders import melgan

    cfg = melgan.MelGANConfig(in_channels=4, channels=16,
                              upsample_scales=(2, 2), stacks=2,
                              use_causal_conv=True)
    params = melgan.init(jax.random.PRNGKey(0), cfg)

    class CausalConv(tnn.Module):
        # causal_conv.py:12-33 with MelGAN's ReflectionPad1d pad module
        def __init__(self, i, o, k, d=1):
            super().__init__()
            self.pad = tnn.ReflectionPad1d((k - 1) * d)
            self.conv = tnn.Conv1d(i, o, k, dilation=d)

        def forward(self, x):
            return self.conv(self.pad(x))[:, :, : x.size(2)]

    class CausalConvT(tnn.Module):
        # causal_conv.py:36-56: plain deconv, drop trailing `stride`
        def __init__(self, i, o, k, s):
            super().__init__()
            self.deconv = tnn.ConvTranspose1d(i, o, k, s)
            self.s = s

        def forward(self, x):
            return self.deconv(x)[:, :, : -self.s]

    def set_conv(mod, p):
        with torch.no_grad():
            mod.weight.copy_(torch.from_numpy(
                np.asarray(p["w"]).transpose(2, 1, 0)))
            mod.bias.copy_(torch.from_numpy(np.asarray(p["b"])))

    def set_convt(mod, p):
        with torch.no_grad():  # jax [k, out, in] -> torch [in, out, k]
            mod.weight.copy_(torch.from_numpy(
                np.asarray(p["w"]).transpose(2, 1, 0)))
            mod.bias.copy_(torch.from_numpy(np.asarray(p["b"])))

    conv_in = CausalConv(4, 16, 7)
    set_conv(conv_in.conv, params["conv_in"])
    tmods = [conv_in]
    ch = 16
    for i, rate in enumerate(cfg.upsample_scales):
        tmods.append(tnn.LeakyReLU(0.2))
        up = CausalConvT(ch, ch // 2, rate * 2, rate)
        set_convt(up.deconv, params["ups"][i])
        tmods.append(up)
        ch //= 2
        for j, blk in enumerate(params["blocks"][i]):
            d = cfg.stack_kernel_size ** j
            stack = tnn.Sequential(
                tnn.LeakyReLU(0.2), CausalConv(ch, ch, 3, d),
                tnn.LeakyReLU(0.2), tnn.Conv1d(ch, ch, 1))
            set_conv(stack[1].conv, blk["c1"])
            set_conv(stack[3], blk["c2"])
            skip = tnn.Conv1d(ch, ch, 1)
            set_conv(skip, blk["skip"])

            class Stack(tnn.Module):  # residual_stack.py:54-76 causal arm
                def __init__(self, s, sk):
                    super().__init__()
                    self.s, self.sk = s, sk

                def forward(self, x):
                    return self.s(x) + self.sk(x)

            tmods.append(Stack(stack, skip))
    tmods.append(tnn.LeakyReLU(0.2))
    conv_out = CausalConv(ch, 1, 7)
    set_conv(conv_out.conv, params["conv_out"])
    tmods += [conv_out, tnn.Tanh()]
    tnet = tnn.Sequential(*tmods)

    mel = np.random.RandomState(0).randn(1, 12, 4).astype(np.float32)
    with torch.no_grad():
        y_t = tnet(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()[:, 0]
    y_j = np.asarray(melgan.apply(params, cfg, jnp.asarray(mel)))
    assert y_j.shape == (1, 12 * 4)
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=1e-5)


def test_melgan_causal_mode_is_causal():
    """Changing frames >= t0 must not change samples < t0 * prod(scales)."""
    from diffsvc_tpu.vocoders import melgan

    cfg = melgan.MelGANConfig(in_channels=4, channels=16,
                              upsample_scales=(2, 2), stacks=2,
                              use_causal_conv=True)
    params = melgan.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(1)
    mel_a = rng.randn(1, 16, 4).astype(np.float32)
    mel_b = mel_a.copy()
    t0 = 8
    mel_b[:, t0:] += rng.randn(1, 16 - t0, 4).astype(np.float32)
    y_a = np.asarray(melgan.apply(params, cfg, jnp.asarray(mel_a)))
    y_b = np.asarray(melgan.apply(params, cfg, jnp.asarray(mel_b)))
    up = 4
    np.testing.assert_allclose(y_a[:, : t0 * up], y_b[:, : t0 * up],
                               rtol=1e-5, atol=1e-6)
    assert np.abs(y_a[:, t0 * up:] - y_b[:, t0 * up:]).max() > 1e-4


def test_source_module_cyc_noise():
    """SourceModuleCycNoise_v1 wrapper surface (reference source.py:444-483):
    (cyc, noise, uv) with the noise branch at std noise_std/3."""
    from diffsvc_tpu.vocoders.source import source_module_cyc_noise

    sr = 8000
    f0 = jnp.concatenate([jnp.full((1, sr // 2), 100.0),
                          jnp.zeros((1, sr // 2))], axis=1)
    cyc, noise, uv = source_module_cyc_noise(
        jax.random.PRNGKey(0), f0, sr, noise_std=0.003)
    assert cyc.shape == noise.shape == uv.shape == f0.shape
    u = np.asarray(uv[0])
    assert u[: sr // 2].min() == 1.0 and u[sr // 2:].max() == 0.0
    n = np.asarray(noise[0])
    assert abs(n.std() - 0.001) < 3e-4, n.std()
    assert np.isfinite(np.asarray(cyc)).all()
