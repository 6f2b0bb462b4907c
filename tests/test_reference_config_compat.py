"""Reference configs load unchanged through our config chain and construct
working model configs (skipped when the reference checkout is absent)."""

import os

import pytest

REF_24K = "/root/reference/training/config.yaml"
REF_44K = "/root/reference/training/config_nsf.yaml"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_24K),
                                reason="reference checkout not present")


def test_load_reference_24k_config():
    from diffsvc_tpu.config.hparams import load_config_chain
    from diffsvc_tpu.models.diffusion import DiffusionConfig, GaussianDiffusion
    from diffsvc_tpu.models.fs2 import FS2Config

    hp = load_config_chain(REF_24K)
    assert hp["audio_sample_rate"] == 24000
    assert hp["hop_size"] == 128
    assert hp["residual_channels"] == 256
    assert len(hp["spec_min"]) == 80

    cfg = DiffusionConfig.from_hparams(hp)
    assert cfg.timesteps == 1000 and cfg.K_step == 1000
    assert cfg.schedule_type == "linear" and cfg.max_beta == 0.02
    f = FS2Config.from_hparams(hp)
    assert f.no_fs2 is True and f.use_pitch_embed is True
    # full model constructs (tables, spec stats) from the reference config
    model = GaussianDiffusion(hp)
    assert model.mel_bins == 80
    assert model.spec_min.shape == (80,)


def test_load_reference_44k_config():
    from diffsvc_tpu.config.hparams import load_config_chain
    from diffsvc_tpu.models.diffusion import GaussianDiffusion

    hp = load_config_chain(REF_44K)
    assert hp["audio_sample_rate"] == 44100
    assert hp["residual_channels"] == 384
    assert hp["audio_num_mel_bins"] == 128
    # scalar spec_min broadcasts to keep_bins
    model = GaussianDiffusion(hp)
    assert model.spec_min.shape == (128,)
    assert "nsf" in hp["vocoder"].lower()


def test_reference_vocoder_class_path_resolves():
    from diffsvc_tpu.config.hparams import load_config_chain
    from diffsvc_tpu.vocoders.base import get_vocoder_cls

    hp = load_config_chain(REF_44K)
    cls = get_vocoder_cls(hp)  # 'network.vocoders.nsf_hifigan.NsfHifiGAN'
    assert cls.__name__ == "NsfHifiGAN"
    hp24 = load_config_chain(REF_24K)
    assert get_vocoder_cls(hp24).__name__ == "HifiGAN"
