"""Model-layer tests: DiffNet/FS2/vocoder vs independent torch builds.

The torch modules below are written from the architecture spec (SURVEY.md
§2.5-2.6) purely to validate the checkpoint converters and numerical parity;
they generate reference-format state dicts.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from diffsvc_tpu.models import diffnet, fs2, nn as jnn
from diffsvc_tpu.utils import convert_torch as cvt


# ---------------------------------------------------------------------------
# torch mini-DiffNet with reference-format parameter names
# ---------------------------------------------------------------------------

class TorchResBlock(tnn.Module):
    def __init__(self, h, c, dilation):
        super().__init__()
        self.dilated_conv = tnn.Conv1d(c, 2 * c, 3, padding=dilation, dilation=dilation)
        self.diffusion_projection = tnn.Linear(c, c)
        self.conditioner_projection = tnn.Conv1d(h, 2 * c, 1)
        self.output_projection = tnn.Conv1d(c, 2 * c, 1)

    def forward(self, x, cond, step):
        y = x + self.diffusion_projection(step).unsqueeze(-1)
        y = self.dilated_conv(y) + self.conditioner_projection(cond)
        gate, filt = torch.chunk(y, 2, dim=1)
        y = torch.sigmoid(gate) * torch.tanh(filt)
        y = self.output_projection(y)
        residual, skip = torch.chunk(y, 2, dim=1)
        return (x + residual) / math.sqrt(2.0), skip


class TorchDiffNet(tnn.Module):
    def __init__(self, m=16, h=24, c=32, layers=8, cycle=4):
        super().__init__()
        self.input_projection = tnn.Conv1d(m, c, 1)
        self.mlp = tnn.Sequential(tnn.Linear(c, c * 4), tnn.Mish(), tnn.Linear(c * 4, c))
        self.residual_layers = tnn.ModuleList(
            [TorchResBlock(h, c, 2 ** (i % cycle)) for i in range(layers)])
        self.skip_projection = tnn.Conv1d(c, c, 1)
        self.output_projection = tnn.Conv1d(c, m, 1)
        self.c = c

    def forward(self, spec, t, cond):
        x = torch.relu(self.input_projection(spec))
        half = self.c // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half) * -emb)
        emb = t[:, None].float() * emb[None, :]
        step = torch.cat((emb.sin(), emb.cos()), dim=-1)
        step = self.mlp(step)
        skips = []
        for layer in self.residual_layers:
            x, s = layer(x, cond, step)
            skips.append(s)
        x = torch.stack(skips).sum(0) / math.sqrt(len(skips))
        x = torch.relu(self.skip_projection(x))
        return self.output_projection(x)


def test_diffnet_converter_parity():
    torch.manual_seed(0)
    tm = TorchDiffNet()
    B, T = 2, 12
    spec = torch.randn(B, 16, T)
    cond = torch.randn(B, 24, T)
    t = torch.tensor([3, 77])
    with torch.no_grad():
        y_t = tm(spec, t, cond).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = cvt.convert_diffnet(sd, 8)
    cfg = diffnet.DiffNetConfig(in_dims=16, encoder_hidden=24,
                                residual_layers=8, residual_channels=32,
                                dilation_cycle_length=4)
    y_j = diffnet.apply(params, cfg, jnp.asarray(spec.numpy().transpose(0, 2, 1)),
                        jnp.asarray(t.numpy()), jnp.asarray(cond.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 2, 1), y_t,
                               rtol=1e-4, atol=1e-5)


def test_diffnet_zero_init_output():
    cfg = diffnet.DiffNetConfig(in_dims=8, encoder_hidden=8,
                                residual_layers=4, residual_channels=16,
                                dilation_cycle_length=4)
    p = diffnet.init(jax.random.PRNGKey(0), cfg)
    y = diffnet.apply(p, cfg, jnp.ones((1, 6, 8)), jnp.array([0]),
                      jnp.ones((1, 6, 8)))
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-7)


# ---------------------------------------------------------------------------
# FS2 condition encoder
# ---------------------------------------------------------------------------

def _fs2_cfg(**kw):
    base = dict(hidden_size=16, out_dims=8, no_fs2=True, use_pitch_embed=True,
                use_energy_embed=False, use_uv=False, f0_bin=256,
                f0_min=50.0, f0_max=1100.0)
    base.update(kw)
    return fs2.FS2Config(**base)


def test_fs2_gather_and_masking():
    cfg = _fs2_cfg()
    params = fs2.init(jax.random.PRNGKey(0), cfg)
    B, Tp, Tm, H = 1, 4, 8, 16
    hubert = jnp.arange(B * Tp * H, dtype=jnp.float32).reshape(B, Tp, H)
    # frames 0-5 map to phones 1..4; frames 6,7 are padding (0)
    mel2ph = jnp.array([[1, 1, 2, 3, 4, 4, 0, 0]])
    f0 = jnp.full((B, Tm), float(np.log2(220.0)))
    ret = fs2.apply(params, cfg, hubert, mel2ph, f0)
    cond = np.asarray(ret["decoder_inp"])
    # padding frames are fully zero
    np.testing.assert_allclose(cond[0, 6:], 0.0)
    # gathered content: frame0 and frame1 share phone 1 -> same cond rows
    np.testing.assert_allclose(cond[0, 0], cond[0, 1], rtol=1e-6)
    # f0_denorm recovered
    np.testing.assert_allclose(np.asarray(ret["f0_denorm"])[0, :6], 220.0, rtol=1e-4)
    # padded f0 is zeroed
    np.testing.assert_allclose(np.asarray(ret["f0_denorm"])[0, 6:], 0.0)


def test_fs2_energy_embed_changes_cond():
    cfg = _fs2_cfg(use_energy_embed=True)
    params = fs2.init(jax.random.PRNGKey(0), cfg)
    hubert = jnp.ones((1, 4, 16))
    mel2ph = jnp.ones((1, 8), jnp.int32)
    f0 = jnp.full((1, 8), 7.78)
    e1 = fs2.apply(params, cfg, hubert, mel2ph, f0, energy=jnp.zeros((1, 8)))
    e2 = fs2.apply(params, cfg, hubert, mel2ph, f0, energy=jnp.full((1, 8), 2.0))
    assert not np.allclose(np.asarray(e1["decoder_inp"]), np.asarray(e2["decoder_inp"]))


def test_fs2_full_path_runs():
    cfg = _fs2_cfg(no_fs2=False, enc_layers=2, dec_layers=2, num_heads=2)
    params = fs2.init(jax.random.PRNGKey(0), cfg)
    hubert = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
    mel2ph = jnp.ones((2, 8), jnp.int32)
    f0 = jnp.full((2, 8), 7.78)
    ret = fs2.apply(params, cfg, hubert, mel2ph, f0, skip_decoder=False)
    assert ret["mel_out"].shape == (2, 8, 8)
    assert np.isfinite(np.asarray(ret["mel_out"])).all()


# ---------------------------------------------------------------------------
# HiFi-GAN generator conversion parity (small config, weight-normed torch)
# ---------------------------------------------------------------------------

def test_hifigan_generator_converter_parity():
    from diffsvc_tpu.vocoders import generator as gen

    torch.manual_seed(0)
    h = dict(num_mels=8, upsample_initial_channel=16,
             upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
             resblock="1", resblock_kernel_sizes=[3],
             resblock_dilation_sizes=[[1, 3]], sampling_rate=24000)

    wn = tnn.utils.weight_norm

    class TG(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_pre = wn(tnn.Conv1d(8, 16, 7, padding=3))
            self.ups = tnn.ModuleList([
                wn(tnn.ConvTranspose1d(16, 8, 8, 4, padding=2)),
                wn(tnn.ConvTranspose1d(8, 4, 4, 2, padding=1)),
            ])
            rb = []
            for ch in (8, 4):
                block = tnn.Module()
                block.convs1 = tnn.ModuleList([
                    wn(tnn.Conv1d(ch, ch, 3, padding=d, dilation=d)) for d in (1, 3)])
                block.convs2 = tnn.ModuleList([
                    wn(tnn.Conv1d(ch, ch, 3, padding=1)) for _ in (1, 3)])
                rb.append(block)
            self.resblocks = tnn.ModuleList(rb)
            self.conv_post = wn(tnn.Conv1d(4, 1, 7, padding=3))

        def forward(self, x):
            x = self.conv_pre(x)
            for i in range(2):
                x = torch.nn.functional.leaky_relu(x, 0.1)
                x = self.ups[i](x)
                blk = self.resblocks[i]
                xs = x
                acc = None
                for c1, c2 in zip(blk.convs1, blk.convs2):
                    xt = torch.nn.functional.leaky_relu(xs, 0.1)
                    xt = c1(xt)
                    xt = torch.nn.functional.leaky_relu(xt, 0.1)
                    xt = c2(xt)
                    xs = xt + xs
                x = xs
            x = torch.nn.functional.leaky_relu(x)
            x = self.conv_post(x)
            return torch.tanh(x)

    tm = TG()
    x = torch.randn(1, 8, 20)
    with torch.no_grad():
        y_t = tm(x).numpy()[:, 0]

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    cfg = gen.HifiGanConfig.from_dict(h)
    params = cvt.convert_hifigan_generator(sd, cfg)
    y_j = gen.apply(params, cfg, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    assert y_j.shape == (1, 20 * 8)
    np.testing.assert_allclose(np.asarray(y_j), y_t, rtol=1e-4, atol=1e-5)


def test_sine_gen_frequency():
    from diffsvc_tpu.vocoders.generator import sine_gen

    sr = 24000
    f0 = jnp.full((1, sr), 200.0)
    sines, uv = sine_gen(jax.random.PRNGKey(0), f0, sr, harmonic_num=1,
                         noise_std=0.0)
    s = np.asarray(sines[0, :, 0])
    # zero crossings of a 200 Hz sine over 1s ~ 400
    crossings = np.sum(np.abs(np.diff(np.sign(s))) > 0)
    assert abs(crossings - 400) <= 6
    assert np.asarray(uv).min() == 1.0  # all voiced


def test_sine_gen_unvoiced_noise_only():
    from diffsvc_tpu.vocoders.generator import sine_gen

    f0 = jnp.zeros((1, 1000))
    sines, uv = sine_gen(jax.random.PRNGKey(0), f0, 24000, harmonic_num=0)
    assert np.asarray(uv).max() == 0.0
    s = np.asarray(sines)
    assert np.abs(s).max() < 0.2  # noise at sine_amp/3
    assert s.std() > 0.0


def test_fs2_spk_id_conditioning():
    cfg = _fs2_cfg(use_spk_id=True, num_spk=4)
    params = fs2.init(jax.random.PRNGKey(0), cfg)
    hubert = jnp.ones((2, 4, 16))
    mel2ph = jnp.ones((2, 8), jnp.int32)
    f0 = jnp.full((2, 8), 7.78)
    r1 = fs2.apply(params, cfg, hubert, mel2ph, f0,
                   spk_embed=jnp.array([1, 1]))
    r2 = fs2.apply(params, cfg, hubert, mel2ph, f0,
                   spk_embed=jnp.array([1, 2]))
    a1 = np.asarray(r1["decoder_inp"])
    a2 = np.asarray(r2["decoder_inp"])
    np.testing.assert_allclose(a1[0], a2[0], rtol=1e-6)  # same speaker
    assert not np.allclose(a1[1], a2[1])  # different speaker changes cond
