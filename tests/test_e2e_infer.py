"""End-to-end inference test (SURVEY.md §4c): synthesize reference-format
checkpoints (diffusion ckpt + HiFi-GAN ckpt) with tiny dims, then run the
full Svc facade on a synthetic wav: slicing -> features -> PLMS sampling ->
vocoder. Everything on CPU with random weights; asserts shapes/finiteness
and the key-shift/caching plumbing."""

import math
import os

import numpy as np
import pytest
import torch
import torch.nn as tnn
import yaml

import diffsvc_tpu.infer.svc as svc_mod
from diffsvc_tpu.infer.svc import Svc

MEL_BINS = 16
HID = 256  # must match hubert unit dim
RES_CH = 32
LAYERS = 4


def _make_diffusion_ckpt(path):
    """state_dict with model.fs2.* / model.denoise_fn.* in reference format."""
    g = torch.Generator().manual_seed(0)

    def r(*shape, scale=0.05):
        return torch.randn(*shape, generator=g) * scale

    sd = {}
    sd["model.fs2.mel_out.weight"] = r(MEL_BINS, HID)
    sd["model.fs2.mel_out.bias"] = r(MEL_BINS)
    sd["model.fs2.pitch_embed.weight"] = r(300, HID)
    sd["model.denoise_fn.input_projection.weight"] = r(RES_CH, MEL_BINS, 1)
    sd["model.denoise_fn.input_projection.bias"] = r(RES_CH)
    sd["model.denoise_fn.mlp.0.weight"] = r(RES_CH * 4, RES_CH)
    sd["model.denoise_fn.mlp.0.bias"] = r(RES_CH * 4)
    sd["model.denoise_fn.mlp.2.weight"] = r(RES_CH, RES_CH * 4)
    sd["model.denoise_fn.mlp.2.bias"] = r(RES_CH)
    for i in range(LAYERS):
        p = f"model.denoise_fn.residual_layers.{i}"
        sd[f"{p}.dilated_conv.weight"] = r(2 * RES_CH, RES_CH, 3)
        sd[f"{p}.dilated_conv.bias"] = r(2 * RES_CH)
        sd[f"{p}.diffusion_projection.weight"] = r(RES_CH, RES_CH)
        sd[f"{p}.diffusion_projection.bias"] = r(RES_CH)
        sd[f"{p}.conditioner_projection.weight"] = r(2 * RES_CH, HID, 1)
        sd[f"{p}.conditioner_projection.bias"] = r(2 * RES_CH)
        sd[f"{p}.output_projection.weight"] = r(2 * RES_CH, RES_CH, 1)
        sd[f"{p}.output_projection.bias"] = r(2 * RES_CH)
    sd["model.denoise_fn.skip_projection.weight"] = r(RES_CH, RES_CH, 1)
    sd["model.denoise_fn.skip_projection.bias"] = r(RES_CH)
    sd["model.denoise_fn.output_projection.weight"] = torch.zeros(MEL_BINS, RES_CH, 1)
    sd["model.denoise_fn.output_projection.bias"] = torch.zeros(MEL_BINS)
    torch.save({"state_dict": sd, "epoch": 0, "global_step": 1000}, path)


def _make_hifigan_ckpt(dirpath):
    """Tiny weight-normed generator in reference ckpt format."""
    wn = tnn.utils.weight_norm
    torch.manual_seed(0)
    m = tnn.Module()
    m.conv_pre = wn(tnn.Conv1d(MEL_BINS, 16, 7, padding=3))
    m.ups = tnn.ModuleList([
        wn(tnn.ConvTranspose1d(16, 8, 8, 4, padding=2)),
        wn(tnn.ConvTranspose1d(8, 4, 4, 2, padding=1)),
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
    sd = {k: v for k, v in m.state_dict().items()}
    os.makedirs(dirpath, exist_ok=True)
    torch.save({"state_dict": {"model_gen": sd}},
               os.path.join(dirpath, "model_ckpt_steps_1000.ckpt"))
    cfg = dict(audio_num_mel_bins=MEL_BINS, upsample_initial_channel=16,
               upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
               resblock="1", resblock_kernel_sizes=[3],
               resblock_dilation_sizes=[[1, 3]], audio_sample_rate=8000)
    with open(os.path.join(dirpath, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)


@pytest.fixture(scope="module")
def svc(tmp_path_factory, module_mocker=None):
    tmp = tmp_path_factory.mktemp("e2e")
    ckpt_dir = tmp / "checkpoints" / "testproj"
    ckpt_dir.mkdir(parents=True)
    _make_diffusion_ckpt(str(ckpt_dir / "model_ckpt_steps_1000.ckpt"))
    _make_hifigan_ckpt(str(tmp / "vocoder"))

    hp = dict(
        audio_sample_rate=8000, audio_num_mel_bins=MEL_BINS, fft_size=256,
        hop_size=64, win_size=256, fmin=30, fmax=4000, wav2spec_eps=1e-6,
        hidden_size=HID, residual_layers=LAYERS, residual_channels=RES_CH,
        dilation_cycle_length=4, timesteps=50, K_step=50,
        diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=MEL_BINS, spec_min=[-6.0], spec_max=[1.5],
        no_fs2=True, use_pitch_embed=True, use_energy_embed=False,
        use_spk_id=False, use_spk_embed=False, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=50.0, f0_max=1100.0,
        use_nsf=False, use_crepe=False, use_vec=False,
        vocoder="HifiGAN", vocoder_ckpt=str(tmp / "vocoder"),
        hubert_path=str(tmp / "nonexistent_hubert"),
        pe_ckpt="", pe_enable=False,
        max_frames=42000, max_input_tokens=60000, mel_vmin=-6.0, mel_vmax=1.5,
        binarization_args=dict(with_f0=True, with_hubert=True, with_align=True),
        work_dir="", pndm_speedup=10, debug=False,
    )
    cfg_fn = tmp / "config.yaml"
    with open(cfg_fn, "w") as f:
        yaml.safe_dump(hp, f)

    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        model = Svc("testproj", str(cfg_fn), False,
                    str(ckpt_dir / "model_ckpt_steps_1000.ckpt"),
                    pad_multiple=64)
        # no real hubert weights: random soft units at the 320x frame rate
        rng = np.random.RandomState(0)

        def fake_encode(wav_path):
            from diffsvc_tpu.utils.audio_io import load_wav

            wav, _ = load_wav(wav_path, sr=16000)
            n = max(len(wav) // 320, 1)
            return rng.randn(n, HID).astype(np.float32) * 0.1

        model.hubert.encode = fake_encode
        yield model
    finally:
        os.chdir(cwd)


def _write_test_wav(path, sr=8000, secs=1.0, freq=220.0):
    from diffsvc_tpu.utils.audio_io import save_wav

    t = np.arange(int(sr * secs)) / sr
    wav = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    save_wav(wav, str(path), sr)
    return wav


def test_e2e_infer_produces_audio(svc, tmp_path):
    wav_fn = tmp_path / "in.wav"
    _write_test_wav(wav_fn)
    f0_gt, f0_pred, wav_pred = svc.infer(
        str(wav_fn), key=0, acc=10, use_pe=False, use_crepe=False)
    assert np.isfinite(wav_pred).all()
    assert len(wav_pred) > 0
    # vocoder upsamples 8x from mel frames at hop 64 of the 8 kHz input
    n_frames = len(f0_pred)
    assert len(wav_pred) == n_frames * 8
    # input f0 track sees the 220 Hz tone
    voiced = f0_gt[f0_gt > 0]
    assert len(voiced) > 0
    assert abs(np.median(voiced) - 220.0) < 10


def test_e2e_key_shift(svc, tmp_path):
    wav_fn = tmp_path / "in2.wav"
    _write_test_wav(wav_fn)
    f0_gt, _, _ = svc.infer(str(wav_fn), key=12, acc=10, use_pe=False,
                            use_crepe=False)
    voiced = f0_gt[f0_gt > 0]
    # +12 semitones = one octave up
    assert abs(np.median(voiced) - 440.0) < 20


def test_e2e_ddpm_path(svc, tmp_path):
    wav_fn = tmp_path / "in3.wav"
    _write_test_wav(wav_fn, secs=0.5)
    # acc=1 -> full DDPM sampling (50 steps at the tiny K_step)
    _, _, wav_pred = svc.infer(str(wav_fn), key=0, acc=1, use_pe=False,
                               use_crepe=False)
    assert np.isfinite(wav_pred).all() and len(wav_pred) > 0


def test_e2e_use_gt_mel(svc, tmp_path):
    wav_fn = tmp_path / "in4.wav"
    _write_test_wav(wav_fn, secs=0.5)
    _, _, wav_pred = svc.infer(str(wav_fn), key=0, acc=10, use_pe=False,
                               use_crepe=False, use_gt_mel=True,
                               add_noise_step=20)
    assert np.isfinite(wav_pred).all() and len(wav_pred) > 0


def test_e2e_infer_batched(svc, tmp_path):
    """Grouped-batch inference returns per-clip results in input order."""
    paths = []
    for i, secs in enumerate((0.8, 0.8, 0.5)):
        p = tmp_path / f"b{i}.wav"
        _write_test_wav(p, secs=secs, freq=200.0 + 40 * i)
        paths.append(str(p))
    results = svc.infer_batched(paths, key=0, acc=10, use_pe=False,
                                use_crepe=False)
    assert len(results) == 3
    for i, (f0_gt, f0_pred, wav_pred) in enumerate(results):
        assert np.isfinite(wav_pred).all() and len(wav_pred) > 0
        voiced = f0_gt[f0_gt > 0]
        assert abs(np.median(voiced) - (200.0 + 40 * i)) < 15
    # equal-length clips should yield equal-length outputs
    assert len(results[0][2]) == len(results[1][2])
    assert len(results[2][2]) < len(results[0][2])


def _make_pe_ckpt(path, mel=MEL_BINS, h=HID):
    """pe checkpoint in reference state-dict format (model.* prefix)."""
    g = torch.Generator().manual_seed(3)

    def r(*shape, scale=0.05):
        return torch.randn(*shape, generator=g) * scale

    sd = {}
    c_in = mel
    for i in range(3):
        p = f"model.mel_prenet.layers.{i}"
        sd[f"{p}.0.weight"] = r(h, c_in, 5)
        sd[f"{p}.0.bias"] = r(h)
        sd[f"{p}.2.weight"] = torch.ones(h)
        sd[f"{p}.2.bias"] = torch.zeros(h)
        sd[f"{p}.2.running_mean"] = torch.zeros(h)
        sd[f"{p}.2.running_var"] = torch.ones(h)
        c_in = h
    sd["model.mel_prenet.out_proj.weight"] = r(h, h)
    sd["model.mel_prenet.out_proj.bias"] = r(h)
    sd["model.mel_encoder.in_proj.weight"] = r(h, h)
    sd["model.mel_encoder.in_proj.bias"] = r(h)
    for i in range(2):
        p = f"model.mel_encoder.conv.{i}"
        sd[f"{p}.conv.conv.weight"] = r(h, h, 5)
        sd[f"{p}.conv.conv.bias"] = r(h)
        sd[f"{p}.norm.weight"] = torch.ones(h)
        sd[f"{p}.norm.bias"] = torch.zeros(h)
    sd["model.mel_encoder.out_proj.weight"] = r(h, h)
    sd["model.mel_encoder.out_proj.bias"] = r(h)
    c_in = h
    for i in range(5):
        p = f"model.pitch_predictor.conv.{i}"
        sd[f"{p}.1.weight"] = r(h, c_in, 5)
        sd[f"{p}.1.bias"] = r(h)
        sd[f"{p}.3.weight"] = torch.ones(h)
        sd[f"{p}.3.bias"] = torch.zeros(h)
        c_in = h
    sd["model.pitch_predictor.linear.weight"] = r(2, h)
    sd["model.pitch_predictor.linear.bias"] = r(2)
    sd["model.pitch_predictor.pos_embed_alpha"] = torch.ones(1)
    torch.save({"state_dict": sd}, path)


def test_e2e_use_pe_branch(svc, tmp_path):
    """use_pe: f0 for the vocoder comes from the pe re-estimation of the
    generated mel instead of the conditioner's f0."""
    from diffsvc_tpu.utils import convert_torch as cvt

    pe_path = tmp_path / "pe_ckpt_steps_1.ckpt"
    _make_pe_ckpt(str(pe_path))
    svc.pe_params = cvt.convert_pe(str(pe_path), svc.hp)
    try:
        wav_fn = tmp_path / "pe_in.wav"
        _write_test_wav(wav_fn, secs=0.6)
        f0_gt, f0_pred, wav_pred = svc.infer(
            str(wav_fn), key=0, acc=10, use_pe=True, use_crepe=False)
        assert np.isfinite(wav_pred).all() and len(wav_pred) > 0
        # pe path used: f0_pred is the pe output, not the conditioner f0
        assert not np.allclose(f0_pred, f0_gt[: len(f0_pred)])
    finally:
        svc.pe_params = None


def test_resolve_spk_id_mapping():
    """Multi-speaker: names resolve through the binarizer spk_map; explicit
    ints win; unknown -> 0."""
    from diffsvc_tpu.infer.svc import Svc

    svc = object.__new__(Svc)
    svc.project_name = "alice"
    svc.spk_map = {"alice": 3, "bob": 1}
    svc.hp = {"use_spk_id": True}
    assert svc.resolve_spk_id(None) == 3
    assert svc.resolve_spk_id(1) == 1
    assert svc.resolve_spk_id("bob") == 1
    svc.project_name = "unknown"
    svc.hp = {"speaker_id": "bob"}
    assert svc.resolve_spk_id(None) == 1
    svc.spk_map = {}
    svc.hp = {}
    assert svc.resolve_spk_id(None) == 0
