"""HuBERT and PitchExtractor converter parity vs independent torch builds."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from diffsvc_tpu.models import hubert as jhubert
from diffsvc_tpu.models import pe as jpe


class TorchMiniHubert(tnn.Module):
    """Reference-format state dict names, scaled-down dims (dim=32, heads=4,
    2 layers) for converter validation."""

    def __init__(self, dim=32, heads=4, layers=2, ffn=64):
        super().__init__()
        fe = tnn.Module()
        fe.conv0 = tnn.Conv1d(1, 512, 10, 5, bias=False)
        fe.norm0 = tnn.GroupNorm(512, 512)
        for i in range(1, 7):
            k, s = jhubert.CONV_SPECS[i]
            setattr(fe, f"conv{i}", tnn.Conv1d(512, 512, k, s, bias=False))
        self.feature_extractor = fe
        fp = tnn.Module()
        fp.norm = tnn.LayerNorm(512)
        fp.projection = tnn.Linear(512, dim)
        self.feature_projection = fp
        pe_ = tnn.Module()
        pe_.conv = tnn.utils.weight_norm(
            tnn.Conv1d(dim, dim, 128, padding=64, groups=16), dim=2)
        self.positional_embedding = pe_
        self.norm = tnn.LayerNorm(dim)
        enc = tnn.Module()
        enc.layers = tnn.ModuleList([
            tnn.TransformerEncoderLayer(dim, heads, ffn, activation="gelu",
                                        batch_first=True, dropout=0.0)
            for _ in range(layers)])
        self.encoder = enc
        self.proj = tnn.Linear(dim, 16)

    def forward(self, wav):
        wav = torch.nn.functional.pad(wav, (40, 40))
        x = wav[:, None, :]
        x = torch.nn.functional.gelu(self.feature_extractor.norm0(
            self.feature_extractor.conv0(x)))
        for i in range(1, 7):
            x = torch.nn.functional.gelu(getattr(self.feature_extractor, f"conv{i}")(x))
        x = x.transpose(1, 2)
        x = self.feature_projection.projection(self.feature_projection.norm(x))
        p = self.positional_embedding.conv(x.transpose(1, 2))
        p = torch.nn.functional.gelu(p[:, :, :-1]).transpose(1, 2)
        x = self.norm(x + p)
        for layer in self.encoder.layers:
            x = layer(x)
        return self.proj(x)


def test_hubert_converter_parity():
    torch.manual_seed(0)
    tm = TorchMiniHubert().eval()
    wav = torch.randn(1, 16000 // 4) * 0.1
    with torch.no_grad():
        y_t = tm(wav).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    cfg = jhubert.HubertConfig(dim=32, num_heads=4, num_layers=2, ffn_dim=64,
                               proj_dim=16)
    params = jhubert.convert(sd, cfg)
    y_j = np.asarray(jhubert.units(params, cfg, jnp.asarray(wav.numpy())))
    assert y_j.shape == y_t.shape
    np.testing.assert_allclose(y_j, y_t, rtol=1e-3, atol=1e-4)


def test_hubert_frame_rate():
    """320x downsample: 1 s of 16 kHz audio -> 50 unit frames."""
    cfg = jhubert.HubertConfig(dim=32, num_heads=4, num_layers=1, ffn_dim=64,
                               proj_dim=16)
    params = jhubert.init(jax.random.PRNGKey(0), cfg)
    u = jhubert.units(params, cfg, jnp.zeros((1, 16000)))
    assert u.shape == (1, 50, 16)


# ---------------------------------------------------------------------------
# PitchExtractor
# ---------------------------------------------------------------------------

class TorchMiniPE(tnn.Module):
    """Reference pe state-dict format (modules/fastspeech/pe.py), small dims."""

    def __init__(self, mel=16, h=32, k=5):
        super().__init__()
        pn = tnn.Module()
        pn.layers = tnn.ModuleList()
        c_in = mel
        for _ in range(3):
            pn.layers.append(tnn.Sequential(
                tnn.Conv1d(c_in, h, 5, padding=2), tnn.ReLU(), tnn.BatchNorm1d(h)))
            c_in = h
        pn.out_proj = tnn.Linear(h, h)
        self.mel_prenet = pn
        me = tnn.Module()
        me.in_proj = tnn.Linear(h, h)
        me.conv = tnn.ModuleList()
        for _ in range(2):
            blk = tnn.Module()
            conv_wrap = tnn.Module()
            conv_wrap.conv = tnn.Conv1d(h, h, 5, padding=2)
            blk.conv = conv_wrap
            blk.norm = tnn.GroupNorm(h // 16, h)
            me.conv.append(blk)
        me.out_proj = tnn.Linear(h, h)
        self.mel_encoder = me
        pp = tnn.Module()
        pp.conv = tnn.ModuleList()
        c_in = h
        for _ in range(5):
            pp.conv.append(tnn.Sequential(
                tnn.ConstantPad1d((2, 2), 0), tnn.Conv1d(c_in, h, k),
                tnn.ReLU(), TorchChannelLN(h)))
            c_in = h
        pp.linear = tnn.Linear(h, 2)
        pp.pos_embed_alpha = tnn.Parameter(torch.tensor([1.0]))
        self.pitch_predictor = pp
        self.h = h

    def forward(self, mel):
        pad_mask = mel.abs().sum(-1).eq(0)
        nonpad = 1 - pad_mask.float()[:, None, :]
        x = mel.transpose(1, 2)
        for l in self.mel_prenet.layers:
            x = l(x) * nonpad
        x = self.mel_prenet.out_proj(x.transpose(1, 2)) * nonpad.transpose(1, 2)
        x = self.mel_encoder.in_proj(x).transpose(1, 2)
        for blk in self.mel_encoder.conv:
            y = torch.relu(blk.norm(blk.conv.conv(x)))
            x = x + y
        x = self.mel_encoder.out_proj(x.transpose(1, 2))
        # sinusoidal positions, fairseq layout (sin||cos), 1-based
        T, C = x.shape[1], x.shape[2]
        half = C // 2
        import math
        freq = torch.exp(torch.arange(half) * -(math.log(10000.0) / (half - 1)))
        pos = torch.arange(1, T + 1).float()[:, None] * freq[None, :]
        pos = torch.cat([pos.sin(), pos.cos()], dim=1)
        x = x + self.pitch_predictor.pos_embed_alpha * pos[None]
        x = x.transpose(1, 2)
        for f in self.pitch_predictor.conv:
            x = f(x)
        return self.pitch_predictor.linear(x.transpose(1, 2))


class TorchChannelLN(tnn.LayerNorm):
    """reference common_layers.LayerNorm(dim=1) on [B, C, T]."""

    def forward(self, x):
        return super().forward(x.transpose(1, -1)).transpose(1, -1)


def test_pe_converter_parity():
    torch.manual_seed(0)
    tm = TorchMiniPE().eval()
    mel = torch.randn(2, 12, 16)
    mel[1, 8:] = 0.0  # padding frames
    with torch.no_grad():
        y_t = tm(mel).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jpe.convert(sd)
    cfg = jpe.PEConfig(n_mel_bins=16, hidden_size=32, predictor_hidden=32,
                       conv_layers=2)
    ret = jpe.apply(params, cfg, jnp.asarray(mel.numpy()))
    np.testing.assert_allclose(np.asarray(ret["pitch_pred"]), y_t,
                               rtol=1e-3, atol=1e-4)
    # padded frames must yield f0=0
    np.testing.assert_allclose(np.asarray(ret["f0_denorm_pred"])[1, 8:], 0.0)
