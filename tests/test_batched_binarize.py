"""Batched binarization: grouped device pipeline must produce the same
features as the per-item path."""

import os

import numpy as np
import pytest

from diffsvc_tpu.config import HParams
from diffsvc_tpu.data import features
from diffsvc_tpu.utils.audio_io import save_wav


@pytest.fixture()
def wav_dir(tmp_path):
    sr = 8000
    for i in range(5):
        secs = 0.5 + 0.2 * i
        t = np.arange(int(sr * secs)) / sr
        wav = 0.4 * np.sin(2 * np.pi * (160 + 30 * i) * t).astype(np.float32)
        save_wav(wav, str(tmp_path / f"w{i}.wav"), sr)
    return tmp_path


def _hp(tmp):
    return HParams(
        audio_sample_rate=8000, audio_num_mel_bins=16, fft_size=256,
        hop_size=64, win_size=256, fmin=30, fmax=4000, wav2spec_eps=1e-6,
        vocoder="HifiGAN", use_crepe=False, f0_bin=256, f0_min=50.0,
        f0_max=1100.0, pitch_norm="log", use_uv=False, speaker_id="t",
        wav_bucket_frames=32,
        binarization_args=dict(with_f0=True, with_hubert=True,
                               with_align=True, with_wav=False),
        f0_cache_dir="")


class DeterministicEnc:
    """Fake hubert whose units depend only on frame index (comparable
    between the per-item and batched paths)."""

    params = object()

    def encode(self, wav_fn):
        from diffsvc_tpu.utils.audio_io import load_wav

        wav, _ = load_wav(wav_fn, sr=16000)
        n = max(len(wav) // 320, 1)
        return np.arange(n)[:, None].repeat(8, 1).astype(np.float32)

    def encode_batch(self, wavs16):
        b, L = wavs16.shape
        n = L // 320
        u = np.arange(n)[:, None].repeat(8, 1).astype(np.float32)
        return np.stack([u] * b)


def test_batched_matches_per_item(wav_dir):
    hp = _hp(wav_dir)
    enc = DeterministicEnc()
    metas = [(f"w{i}", str(wav_dir / f"w{i}.wav")) for i in range(5)]

    per_item = [features.process_item(n, fn, hp, enc.encode,
                                      hp["binarization_args"], use_crepe=False)
                for n, fn in metas]
    batched = {}
    for i, item in features.process_items_batched(
            metas, hp, enc.encode_batch, hp["binarization_args"],
            group_size=3):
        batched[i] = item

    for i, ref in enumerate(per_item):
        got = batched[i]
        assert got is not None and ref is not None
        np.testing.assert_allclose(got["mel"], ref["mel"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got["f0"], ref["f0"], rtol=1e-4, atol=1e-3)
        assert got["hubert"].shape == ref["hubert"].shape
        np.testing.assert_array_equal(got["mel2ph"], ref["mel2ph"])
        assert got["len"] == ref["len"]


def test_f0_disk_cache(wav_dir):
    hp = _hp(wav_dir)
    hp["f0_cache_dir"] = str(wav_dir / "f0cache")
    from diffsvc_tpu.utils.audio_io import load_wav

    wav, _ = load_wav(str(wav_dir / "w0.wav"), sr=8000)
    from diffsvc_tpu.ops.mel import wav2spec

    _, mel = wav2spec(wav, hp)
    f0a, _ = features.get_pitch(wav, mel, hp)
    assert len(os.listdir(hp["f0_cache_dir"])) == 1
    f0b, _ = features.get_pitch(wav, mel, hp)  # cache hit
    np.testing.assert_array_equal(f0a, f0b)


def test_multispeaker_discovery(tmp_path):
    """use_spk_id + num_spk>1: first-level subdirs become speakers with
    stable integer ids via spk_map."""
    from diffsvc_tpu.data.binarizer import SVCBinarizer

    sr = 8000
    for spk in ("alice", "bob"):
        d = tmp_path / "raw" / spk
        d.mkdir(parents=True)
        for i in range(3):
            t = np.arange(sr // 2) / sr
            save_wav(0.3 * np.sin(2 * np.pi * 200 * t).astype(np.float32),
                     str(d / f"{spk}{i}.wav"), sr)
    hp = _hp(tmp_path)
    hp.update(raw_data_dir=str(tmp_path / "raw"), use_spk_id=True, num_spk=2,
              binary_data_dir=str(tmp_path / "bin"))
    b = SVCBinarizer(hp)
    spks = {v["spk_id"] for v in b.items.values()}
    assert spks == {"alice", "bob"}
    spk_map = b.build_spk_map()
    assert spk_map == {"alice": 0, "bob": 1}
    b.spk_map = spk_map
    assert b.item_name2spk_id(sorted(b.items)[0]) in (0, 1)
