import jax
import numpy as np

from diffsvc_tpu.config import HParams
from diffsvc_tpu.training.vocoder_task import VocoderTask, crop_batch
from diffsvc_tpu.vocoders import generator as gen


def test_vocoder_gan_train_step():
    hp = HParams(
        audio_sample_rate=8000, audio_num_mel_bins=16, fft_size=256,
        hop_size=64, win_size=256, fmin=30, fmax=4000, vocoder="nsf_hifigan",
        use_nsf=True, vocoder_lr=2e-4, lambda_mel=45.0, seed=0)
    cfg = gen.HifiGanConfig(
        num_mels=16, upsample_initial_channel=32,
        upsample_rates=(4, 4, 4), upsample_kernel_sizes=(8, 8, 8),
        resblock="1", resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), sampling_rate=8000, use_nsf=True)
    task = VocoderTask(hp, voc_cfg=cfg)
    state = task.init_state()

    rng = np.random.RandomState(0)
    B, S = 2, 32  # 32 mel frames -> 2048 samples
    batch = {
        "mels": rng.randn(B, S, 16).astype(np.float32) * 0.5 - 2.0,
        "wav": (rng.randn(B, S * 64) * 0.1).astype(np.float32),
        "f0": np.full((B, S), 220.0, np.float32),
    }
    metrics_hist = []
    for i in range(2):
        state, metrics = task.train_step(state, batch, jax.random.PRNGKey(i))
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    for m in metrics_hist:
        for k, v in m.items():
            assert np.isfinite(v), (k, v)
    assert int(state["step"]) == 2


def test_crop_batch():
    hp = HParams(hop_size=64)
    rng = np.random.RandomState(0)
    items = [{"mel": rng.randn(100, 16), "wav": rng.randn(100 * 64),
              "f0": rng.rand(100) * 200} for _ in range(3)]
    batch = crop_batch(items, hp, rng, segment_frames=32)
    assert batch["mels"].shape == (3, 32, 16)
    assert batch["wav"].shape == (3, 32 * 64)
    assert batch["f0"].shape == (3, 32)
    # short item padded
    items.append({"mel": rng.randn(10, 16), "wav": rng.randn(640),
                  "f0": rng.rand(10)})
    batch = crop_batch(items, hp, rng, segment_frames=32)
    assert batch["mels"].shape == (4, 32, 16)


def test_train_vocoder_cli_driver(tmp_path):
    """run.py's vocoder route: binarize (keeping waveforms) then run the
    train_vocoder loop for a couple of steps and checkpoint."""
    import os

    import yaml

    from diffsvc_tpu.data.binarizer import SVCBinarizer
    from diffsvc_tpu.training import checkpoint as ckpt_lib
    from diffsvc_tpu.training.vocoder_task import train_vocoder
    from diffsvc_tpu.utils.audio_io import save_wav

    sr = 8000
    hp = HParams(
        audio_sample_rate=sr, audio_num_mel_bins=16, fft_size=256,
        hop_size=64, win_size=256, fmin=30, fmax=4000, wav2spec_eps=1e-6,
        hidden_size=8, vocoder="nsf_hifigan", use_nsf=True,
        vocoder_lr=2e-4, lambda_mel=45.0, seed=0, num_spk=1,
        use_crepe=False, use_vec=False, use_spk_id=False,
        f0_bin=256, f0_min=50.0, f0_max=1100.0,
        raw_data_dir=str(tmp_path / "raw"), binary_data_dir=str(tmp_path / "bin"),
        work_dir=str(tmp_path / "work"), speaker_id="t",
        choose_test_manually=False, test_prefixes=[],
        hubert_path=str(tmp_path / "nohubert"),
        binarization_args=dict(with_f0=True, with_hubert=True,
                               with_align=True, with_wav=True),
        max_frames=42000, max_input_tokens=60000, max_sentences=2,
        max_updates=2, log_interval=1, val_check_interval=2,
        num_ckpt_keep=2, vocoder_segment_frames=16,
        # tiny generator (upsample product == hop 64)
        upsample_initial_channel=16, upsample_rates=(4, 4, 4),
        upsample_kernel_sizes=(8, 8, 8), resblock="1",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        config_path=str(tmp_path / "cfg.yaml"),
    )
    with open(hp["config_path"], "w") as f:
        yaml.safe_dump({}, f)
    os.makedirs(hp["raw_data_dir"])
    rng = np.random.RandomState(0)
    for i in range(6):
        t = np.arange(int(sr * 0.5)) / sr
        save_wav((0.4 * np.sin(2 * np.pi * (150 + 30 * i) * t)).astype(np.float32),
                 os.path.join(hp["raw_data_dir"], f"v{i}.wav"), sr)

    binarizer = SVCBinarizer(hp)

    class FakeEnc:
        def encode(self, wav_fn):
            return rng.randn(12, 8).astype(np.float32)

    binarizer._phone_encoder = lambda: FakeEnc()
    binarizer.process()

    train_vocoder(hp)
    assert ckpt_lib.latest_checkpoint(hp["work_dir"])


def test_istft_family_trains_in_nsf_mel_geometry():
    """Review fix: with vocoder=istftvocoder the GAN mel-L1 must use the
    NSF nvSTFT mel (S frames for an S-frame segment, the geometry
    IstftVocoder.wav2spec serves with), not the PWG mel (S+1 frames)."""
    import jax
    import numpy as np

    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.ops import mel as mel_ops
    from diffsvc_tpu.training.vocoder_task import VocoderTask

    hp = HParams(audio_sample_rate=8000, audio_num_mel_bins=16,
                 fft_size=256, hop_size=64, win_size=256, fmin=40,
                 fmax=3500, vocoder="istftvocoder", use_nsf=True,
                 istft_dim=32, istft_layers=1)
    task = VocoderTask(hp)
    S = 8
    wav = np.random.RandomState(0).randn(2, S * 64).astype(np.float32)
    got = np.asarray(task._mel_for_loss(wav))
    assert got.shape == (2, S, 16)          # S frames, not S+1
    want = np.asarray(jax.vmap(lambda w: mel_ops.wav2mel_nsf(
        w, sr=8000, n_fft=256, hop=64, win_length=256, n_mels=16,
        fmin=40.0, fmax=3500.0))(wav))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pwg_family_gan_train_step():
    """vocoder_family: pwg — PWG generator + ParallelWaveGANDiscriminator
    GAN step (closes the one §2.6 family that had a generator but no
    adversary; reference vendors but never trains it)."""
    from diffsvc_tpu.training.vocoder_task import _factor_scales

    assert _factor_scales(128) == (4, 4, 4, 2)
    assert _factor_scales(256) == (4, 4, 4, 4)

    hp = HParams(
        audio_sample_rate=8000, audio_num_mel_bins=16, fft_size=256,
        hop_size=64, win_size=256, fmin=30, fmax=4000, vocoder="pwg",
        vocoder_family="pwg", vocoder_lr=2e-4, seed=0,
        pwg_layers=4, pwg_stacks=2, pwg_residual_channels=8,
        pwg_gate_channels=16, pwg_skip_channels=8,
        pwg_disc_layers=4, pwg_disc_channels=8)
    task = VocoderTask(hp)
    assert task.family == "pwg"
    assert task.pcfg.upsample_scales == (4, 4, 4)
    state = task.init_state()

    rng = np.random.RandomState(0)
    B, S = 2, 16
    batch = {
        "mels": rng.randn(B, S, 16).astype(np.float32) * 0.5 - 2.0,
        "wav": (rng.randn(B, S * 64) * 0.1).astype(np.float32),
        "f0": np.full((B, S), 220.0, np.float32),
    }
    for i in range(2):
        state, metrics = task.train_step(state, batch, jax.random.PRNGKey(i))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert {"g_adv", "g_stft", "g_mel", "d_loss", "g_loss"} <= set(metrics)
    assert int(state["step"]) == 2


def test_pwg_family_residual_discriminator_step():
    hp = HParams(
        audio_sample_rate=8000, audio_num_mel_bins=16, fft_size=256,
        hop_size=64, win_size=256, fmin=30, fmax=4000,
        vocoder_family="pwg", pwg_discriminator="residual", seed=0,
        pwg_layers=4, pwg_stacks=2, pwg_residual_channels=8,
        pwg_gate_channels=16, pwg_skip_channels=8,
        pwg_disc_layers=4, pwg_disc_stacks=2)
    task = VocoderTask(hp)
    state = task.init_state()
    rng = np.random.RandomState(1)
    B, S = 1, 16
    batch = {
        "mels": rng.randn(B, S, 16).astype(np.float32) * 0.5 - 2.0,
        "wav": (rng.randn(B, S * 64) * 0.1).astype(np.float32),
        "f0": np.full((B, S), 220.0, np.float32),
    }
    state, metrics = task.train_step(state, batch, jax.random.PRNGKey(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
