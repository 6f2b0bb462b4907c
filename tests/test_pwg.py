"""PWG generator converter parity vs an independent torch build with the
official parameter names."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from diffsvc_tpu.vocoders import pwg


class TorchMiniPWG(tnn.Module):
    """Official parallel_wavegan generator structure, small dims."""

    def __init__(self, layers=6, stacks=2, rc=8, gc=16, sc=8, aux=4,
                 scales=(2, 2), ctx=2):
        super().__init__()
        wn = tnn.utils.weight_norm
        self.layers_n, self.stacks = layers, stacks
        self.rc, self.gc, self.sc = rc, gc, sc
        self.scales, self.ctx = scales, ctx
        self.first_conv = wn(tnn.Conv1d(1, rc, 1))
        un = tnn.Module()
        un.conv_in = wn(tnn.Conv1d(aux, aux, 2 * ctx + 1, bias=False))
        up = tnn.Module()
        up.up_layers = tnn.ModuleList()
        for s in scales:
            up.up_layers.append(tnn.Identity())  # Stretch2d placeholder
            c = tnn.Conv2d(1, 1, (1, 2 * s + 1), padding=(0, s), bias=False)
            c.weight.data.fill_(1.0 / (2 * s + 1))
            up.up_layers.append(c)
        un.upsample = up
        self.upsample_net = un
        self.conv_layers = tnn.ModuleList()
        for i in range(layers):
            blk = tnn.Module()
            d = 2 ** (i % (layers // stacks))
            blk.conv = wn(tnn.Conv1d(rc, gc, 3, dilation=d, padding=d))
            blk.conv1x1_aux = wn(tnn.Conv1d(aux, gc, 1, bias=False))
            blk.conv1x1_out = wn(tnn.Conv1d(gc // 2, rc, 1))
            blk.conv1x1_skip = wn(tnn.Conv1d(gc // 2, sc, 1))
            self.conv_layers.append(blk)
        self.last_conv_layers = tnn.ModuleList([
            tnn.ReLU(), wn(tnn.Conv1d(sc, sc, 1)),
            tnn.ReLU(), wn(tnn.Conv1d(sc, 1, 1))])

    def forward(self, z, c):
        # aux upsample
        c = self.upsample_net.conv_in(c)
        for i, s in enumerate(self.scales):
            c = torch.repeat_interleave(c, s, dim=2)
            c = self.upsample_net.upsample.up_layers[2 * i + 1](
                c.unsqueeze(1)).squeeze(1)
        c = c[:, :, : z.shape[2]]
        x = self.first_conv(z)
        skips = 0.0
        for i, blk in enumerate(self.conv_layers):
            y = blk.conv(x) + blk.conv1x1_aux(c)
            xa, xb = torch.split(y, self.gc // 2, dim=1)
            y = torch.tanh(xa) * torch.sigmoid(xb)
            x = (x + blk.conv1x1_out(y)) * math.sqrt(0.5)
            skips = skips + blk.conv1x1_skip(y)
        s = skips * math.sqrt(1.0 / self.layers_n)
        for l in self.last_conv_layers:
            s = l(s)
        return s


def test_pwg_converter_parity():
    torch.manual_seed(0)
    tm = TorchMiniPWG()
    B, T_mel, AUX, CTX = 1, 12, 4, 2
    scales_prod = 4
    c = torch.randn(B, AUX, T_mel + 2 * CTX)
    z = torch.randn(B, 1, T_mel * scales_prod)
    with torch.no_grad():
        y_t = tm(z, c).numpy()[:, 0]

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    cfg = pwg.PWGConfig(layers=6, stacks=2, residual_channels=8,
                        gate_channels=16, skip_channels=8, aux_channels=4,
                        aux_context_window=2, upsample_scales=(2, 2))
    params = pwg.convert(sd, cfg)
    y_j = pwg.apply(params, cfg, jnp.asarray(z.numpy()[:, 0]),
                    jnp.asarray(c.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y_j), y_t, rtol=1e-4, atol=1e-5)


def test_pwg_init_apply_shapes():
    cfg = pwg.PWGConfig(layers=6, stacks=2, residual_channels=8,
                        gate_channels=16, skip_channels=8, aux_channels=4,
                        aux_context_window=2, upsample_scales=(2, 2))
    params = pwg.init(jax.random.PRNGKey(0), cfg)
    mel = jnp.zeros((1, 20 + 4, 4))  # + context window
    z = jnp.zeros((1, 20 * 4))
    y = pwg.apply(params, cfg, z, mel)
    assert y.shape == (1, 80)
    assert np.isfinite(np.asarray(y)).all()


def test_pwg_official_dir_with_stats_h5(tmp_path):
    """Official-format PWG directory (checkpoint-*steps.pkl +
    config.yaml + stats.h5): the wrapper reads the StandardScaler stats
    from hdf5 (reference network/vocoders/pwg.py:32-39 via
    modules/parallel_wavegan/utils/utils.py:39-64) and normalizes the mel
    before the generator."""
    import pytest
    import yaml

    h5py = pytest.importorskip("h5py")

    torch.manual_seed(1)
    tm = TorchMiniPWG()
    torch.save({"model": {"generator": tm.state_dict()}},
               str(tmp_path / "checkpoint-400000steps.pkl"))
    gen_params = dict(layers=6, stacks=2, residual_channels=8,
                      gate_channels=16, skip_channels=8, aux_channels=4,
                      aux_context_window=2,
                      upsample_params={"upsample_scales": [2, 2]})
    with open(tmp_path / "config.yaml", "w") as f:
        yaml.safe_dump({"generator_params": gen_params, "hop_size": 4}, f)
    rng = np.random.RandomState(0)
    mean = rng.randn(4).astype(np.float32)
    scale = (rng.rand(4) + 0.5).astype(np.float32)
    with h5py.File(tmp_path / "stats.h5", "w") as f:
        f.create_dataset("mean", data=mean)
        f.create_dataset("scale", data=scale)

    g = pwg.PWGGenerator({"vocoder_ckpt": str(tmp_path)})
    np.testing.assert_allclose(g.scaler_mean, mean)
    np.testing.assert_allclose(g.scaler_scale, scale)

    mel = rng.randn(8, 4).astype(np.float32)
    y = g.spec2wav(mel)
    assert y.shape == (8 * 4,)

    # independent path: normalize + edge-pad + apply with the same seed-0 z
    c = (mel - mean) / scale
    c = np.pad(c, ((2, 2), (0, 0)), "edge")
    z = np.random.RandomState(0).randn(1, 8 * 4).astype(np.float32)
    want = np.asarray(pwg.apply(g.params, g.cfg, jnp.asarray(z),
                                jnp.asarray(c[None])))[0]
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-6)


class TorchPWGDisc(tnn.Module):
    """Official ParallelWaveGANDiscriminator structure, small dims
    (reference parallel_wavegan.py:207-303): flat ModuleList alternating
    [wn(Conv1d), LeakyReLU(0.2)], dilation i at layer i>0, final plain conv."""

    def __init__(self, in_ch=1, out_ch=1, k=3, layers=5, cc=8, dil_factor=1):
        super().__init__()
        wn = tnn.utils.weight_norm
        self.conv_layers = tnn.ModuleList()
        conv_in = in_ch
        for i in range(layers - 1):
            if i == 0:
                d = 1
            else:
                d = i if dil_factor == 1 else dil_factor ** i
                conv_in = cc
            pad = (k - 1) // 2 * d
            self.conv_layers += [
                wn(tnn.Conv1d(conv_in, cc, k, padding=pad, dilation=d)),
                tnn.LeakyReLU(0.2, inplace=True)]
        self.conv_layers += [wn(tnn.Conv1d(cc, out_ch, k, padding=(k - 1) // 2))]

    def forward(self, x):
        for f in self.conv_layers:
            x = f(x)
        return x


def test_pwg_discriminator_converter_parity():
    torch.manual_seed(1)
    tm = TorchPWGDisc(layers=5, cc=8)
    x = torch.randn(2, 1, 64)
    with torch.no_grad():
        y_t = tm(x).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    cfg = pwg.PWGDiscriminatorConfig(layers=5, conv_channels=8)
    params = pwg.convert_discriminator(sd, cfg)
    y_j = pwg.apply_discriminator(params, cfg, jnp.asarray(x.numpy()[:, 0]))
    np.testing.assert_allclose(
        np.asarray(y_j)[:, :, 0][:, None], y_t, rtol=1e-4, atol=1e-5)


def test_pwg_discriminator_dilation_factor():
    """dilation_factor != 1 switches the plan to dil_factor**i (ref :246)."""
    torch.manual_seed(2)
    tm = TorchPWGDisc(layers=4, cc=8, dil_factor=2)
    x = torch.randn(1, 1, 48)
    with torch.no_grad():
        y_t = tm(x).numpy()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    cfg = pwg.PWGDiscriminatorConfig(layers=4, conv_channels=8,
                                     dilation_factor=2)
    params = pwg.convert_discriminator(sd, cfg)
    y_j = pwg.apply_discriminator(params, cfg, jnp.asarray(x.numpy()[:, 0]))
    np.testing.assert_allclose(
        np.asarray(y_j)[:, :, 0][:, None], y_t, rtol=1e-4, atol=1e-5)


class TorchResPWGDisc(tnn.Module):
    """ResidualParallelWaveGANDiscriminator structure, small dims
    (reference parallel_wavegan.py:305-435): WaveNet stack, no aux conv,
    LeakyReLU-wrapped 1x1 in/out convs, skips scaled sqrt(1/layers)."""

    def __init__(self, in_ch=1, out_ch=1, k=3, layers=4, stacks=2,
                 rc=8, gc=16, sc=8):
        super().__init__()
        wn = tnn.utils.weight_norm
        self.gc, self.n = gc, layers
        self.first_conv = tnn.Sequential(
            wn(tnn.Conv1d(in_ch, rc, 1)), tnn.LeakyReLU(0.2, inplace=True))
        lps = layers // stacks
        self.conv_layers = tnn.ModuleList()
        for l in range(layers):
            d = 2 ** (l % lps)
            blk = tnn.Module()
            blk.conv = wn(tnn.Conv1d(rc, gc, k, padding=(k - 1) // 2 * d,
                                     dilation=d))
            blk.conv1x1_out = wn(tnn.Conv1d(gc // 2, rc, 1))
            blk.conv1x1_skip = wn(tnn.Conv1d(gc // 2, sc, 1))
            self.conv_layers.append(blk)
        self.last_conv_layers = tnn.ModuleList([
            tnn.LeakyReLU(0.2, inplace=True), wn(tnn.Conv1d(sc, sc, 1)),
            tnn.LeakyReLU(0.2, inplace=True), wn(tnn.Conv1d(sc, out_ch, 1))])

    def forward(self, x):
        x = self.first_conv(x)
        skips = 0.0
        for blk in self.conv_layers:
            residual = x
            y = blk.conv(x)
            xa, xb = torch.split(y, self.gc // 2, dim=1)
            y = torch.tanh(xa) * torch.sigmoid(xb)
            skips = skips + blk.conv1x1_skip(y)
            x = (blk.conv1x1_out(y) + residual) * math.sqrt(0.5)
        x = skips * math.sqrt(1.0 / self.n)
        for f in self.last_conv_layers:
            x = f(x)
        return x


def test_residual_pwg_discriminator_converter_parity():
    torch.manual_seed(3)
    tm = TorchResPWGDisc(layers=4, stacks=2, rc=8, gc=16, sc=8)
    x = torch.randn(2, 1, 64)
    with torch.no_grad():
        y_t = tm(x).numpy()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    cfg = pwg.ResidualPWGDiscriminatorConfig(
        layers=4, stacks=2, residual_channels=8, gate_channels=16,
        skip_channels=8)
    params = pwg.convert_residual_discriminator(sd, cfg)
    y_j = pwg.apply_residual_discriminator(
        params, cfg, jnp.asarray(x.numpy()[:, 0]))
    np.testing.assert_allclose(
        np.asarray(y_j)[:, :, 0][:, None], y_t, rtol=1e-4, atol=1e-5)
