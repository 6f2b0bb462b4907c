"""NsfHifiGAN wrapper: load a synthesized openvpi-format checkpoint
(config.json + 'generator' state dict with weight norm + NSF source) and
vocode."""

import json
import os

import numpy as np
import torch
import torch.nn as tnn

from diffsvc_tpu.config import HParams
from diffsvc_tpu.vocoders.nsf_hifigan import NsfHifiGAN

MEL = 16


def _make_openvpi_ckpt(dirpath):
    wn = tnn.utils.weight_norm
    torch.manual_seed(0)
    m = tnn.Module()
    m.conv_pre = wn(tnn.Conv1d(MEL, 16, 7, padding=3))
    m.ups = tnn.ModuleList([
        wn(tnn.ConvTranspose1d(16, 8, 8, 4, padding=2)),
        wn(tnn.ConvTranspose1d(8, 4, 4, 2, padding=1)),
    ])
    # NSF source: m_source linear + per-stage noise convs
    ms = tnn.Module()
    ms.l_linear = tnn.Linear(9, 1)
    m.m_source = ms
    m.noise_convs = tnn.ModuleList([
        tnn.Conv1d(1, 8, kernel_size=4, stride=2, padding=1),  # stride_f0=2
        tnn.Conv1d(1, 4, kernel_size=1),
    ])
    rb = []
    for ch in (8, 4):
        blk = tnn.Module()
        blk.convs1 = tnn.ModuleList(
            [wn(tnn.Conv1d(ch, ch, 3, padding=d, dilation=d)) for d in (1, 3)])
        blk.convs2 = tnn.ModuleList(
            [wn(tnn.Conv1d(ch, ch, 3, padding=1)) for _ in (1, 3)])
        rb.append(blk)
    m.resblocks = tnn.ModuleList(rb)
    m.conv_post = wn(tnn.Conv1d(4, 1, 7, padding=3))

    os.makedirs(dirpath, exist_ok=True)
    torch.save({"generator": m.state_dict()},
               os.path.join(dirpath, "model"))
    cfg = dict(num_mels=MEL, upsample_initial_channel=16,
               upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
               resblock="1", resblock_kernel_sizes=[3],
               resblock_dilation_sizes=[[1, 3]], sampling_rate=8000,
               n_fft=256, win_size=256, hop_size=8, fmin=30, fmax=4000)
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(cfg, f)


def test_nsf_wrapper_load_and_vocode(tmp_path):
    voc_dir = tmp_path / "nsf"
    _make_openvpi_ckpt(str(voc_dir))
    hp = HParams(
        vocoder="nsf_hifigan", vocoder_ckpt=str(voc_dir / "model"),
        audio_sample_rate=8000, audio_num_mel_bins=MEL, fft_size=256,
        win_size=256, hop_size=8, fmin=30, fmax=4000, use_nsf=True)
    voc = NsfHifiGAN(hp)
    assert voc.cfg.use_nsf
    mel = np.random.RandomState(0).randn(40, MEL).astype(np.float32) - 4.0
    f0 = np.full(40, 220.0, np.float32)
    wav = voc.spec2wav(mel, f0=f0)
    assert wav.shape == (40 * 8,)
    assert np.isfinite(wav).all()


def test_nsf_wrapper_param_mismatch_warns(tmp_path, capsys):
    voc_dir = tmp_path / "nsf2"
    _make_openvpi_ckpt(str(voc_dir))
    hp = HParams(
        vocoder="nsf_hifigan", vocoder_ckpt=str(voc_dir / "model"),
        audio_sample_rate=44100,  # mismatched on purpose
        audio_num_mel_bins=MEL, fft_size=256, win_size=256, hop_size=8,
        fmin=30, fmax=4000, use_nsf=True)
    NsfHifiGAN(hp)
    out = capsys.readouterr().out
    assert "Mismatch parameters" in out


def test_nsf_wrapper_channel_pack_matches_plain(tmp_path):
    """vocoder_channel_pack: on -> the wrapper serves the channel-packed
    path (ops/packed_conv.py); output must match the plain path."""
    voc_dir = tmp_path / "nsf3"
    _make_openvpi_ckpt(str(voc_dir))
    base = dict(
        vocoder="nsf_hifigan", vocoder_ckpt=str(voc_dir / "model"),
        audio_sample_rate=8000, audio_num_mel_bins=MEL, fft_size=256,
        win_size=256, hop_size=8, fmin=30, fmax=4000, use_nsf=True)
    plain = NsfHifiGAN(HParams(vocoder_channel_pack="off", **base))
    packed = NsfHifiGAN(HParams(vocoder_channel_pack="on",
                                vocoder_pack_lanes=16, **base))
    assert plain.pack_lanes == 0 and packed.pack_lanes == 16
    mel = np.random.RandomState(1).randn(40, MEL).astype(np.float32) - 4.0
    f0 = np.full(40, 220.0, np.float32)
    w0 = plain.spec2wav(mel, f0=f0)
    w1 = packed.spec2wav(mel, f0=f0)
    assert w1.shape == w0.shape
    np.testing.assert_allclose(w1, w0, rtol=1e-4, atol=1e-5)
