"""HifiGAN wrapper with use_nsf (the shipped 24 kHz default): reference-style
.ckpt containing m_source/noise_convs loads and vocodes with f0."""

import os

import numpy as np
import torch
import torch.nn as tnn
import yaml

from diffsvc_tpu.config import HParams
from diffsvc_tpu.vocoders.hifigan import HifiGAN

MEL = 16


def _make_ckpt(dirpath):
    wn = tnn.utils.weight_norm
    torch.manual_seed(0)
    m = tnn.Module()
    m.conv_pre = wn(tnn.Conv1d(MEL, 16, 7, padding=3))
    m.ups = tnn.ModuleList([
        wn(tnn.ConvTranspose1d(16, 8, 8, 4, padding=2)),
        wn(tnn.ConvTranspose1d(8, 4, 4, 2, padding=1)),
    ])
    ms = tnn.Module()
    ms.l_linear = tnn.Linear(9, 1)
    m.m_source = ms
    m.noise_convs = tnn.ModuleList([
        tnn.Conv1d(1, 8, kernel_size=4, stride=2, padding=1),
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
    torch.save({"state_dict": {"model_gen": m.state_dict()}},
               os.path.join(dirpath, "model_ckpt_steps_500.ckpt"))
    cfg = dict(audio_num_mel_bins=MEL, upsample_initial_channel=16,
               upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
               resblock="1", resblock_kernel_sizes=[3],
               resblock_dilation_sizes=[[1, 3]], audio_sample_rate=8000)
    with open(os.path.join(dirpath, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)


def test_hifigan_nsf_wrapper(tmp_path):
    voc_dir = tmp_path / "voc24nsf"
    _make_ckpt(str(voc_dir))
    hp = HParams(vocoder="hifigan", vocoder_ckpt=str(voc_dir),
                 audio_sample_rate=8000, use_nsf=True)
    voc = HifiGAN(hp)
    assert voc.cfg.use_nsf
    assert "m_source" in voc.params and len(voc.params["noise_convs"]) == 2

    mel = np.random.RandomState(0).randn(40, MEL).astype(np.float32) - 4.0
    f0 = np.full(40, 220.0, np.float32)
    wav = voc.spec2wav(mel, f0=f0)
    assert wav.shape == (40 * 8,)
    assert np.isfinite(wav).all()
    # voiced f0 actually changes the output (source injection active)
    wav2 = voc.spec2wav(mel, f0=np.full(40, 440.0, np.float32))
    assert not np.allclose(wav, wav2)


def test_spec2wav_bucketing_trims_exact_length(tmp_path):
    """voc_bucket_frames pads the mel to a bucket multiple (one compile per
    bucket) and the wav is trimmed back to exactly T*hop."""
    import numpy as np

    from diffsvc_tpu.vocoders.hifigan import bucket_mel_f0

    hp = {"voc_bucket_frames": 32, "hop_size": 64}
    mel = np.random.RandomState(0).randn(45, 16).astype(np.float32)
    f0 = np.full(45, 220.0, np.float32)
    m2, f2, t = bucket_mel_f0(hp, mel, f0)
    assert m2.shape == (64, 16) and f2.shape == (64,) and t == 45
    assert (m2[45:] == mel.min()).all() and (f2[45:] == 0).all()
    # exact mode: untouched
    hp["voc_bucket_frames"] = 0
    m3, f3, t3 = bucket_mel_f0(hp, mel, f0)
    assert m3.shape == (45, 16) and t3 == 45
