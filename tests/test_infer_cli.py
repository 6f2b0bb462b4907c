import numpy as np

from infer import crossfade_concat, fill_a_to_b


def test_crossfade_concat_blends_seams():
    a = np.ones(100, np.float32)
    b = np.full(100, 3.0, np.float32)
    out = crossfade_concat([(a, 0, 0), (b, 20, 0)])
    assert len(out) == 180
    # before the seam: pure a; after: pure b; inside: monotone blend
    assert out[70] == 1.0
    assert out[150] == 3.0
    seam = out[80:100]
    assert (np.diff(seam) >= 0).all()
    assert seam[0] <= 1.2 and seam[-1] >= 2.8


def test_crossfade_concat_no_overlap():
    a = np.ones(10, np.float32)
    b = np.zeros(10, np.float32)
    out = crossfade_concat([(a, 0, 0), (b, 0, 0)])
    np.testing.assert_array_equal(out, np.concatenate([a, b]))


def test_fill_a_to_b():
    a = [1]
    fill_a_to_b(a, [0, 0, 0])
    assert a == [1, 1, 1]


def test_crossfade_concat_reconstructs_contiguous_signal():
    """Pieces extended into their neighbors by ov on BOTH sides must
    overlap-add back to the original signal exactly (same content in the
    overlap => the linear blend is the identity), with no duplicated or
    dropped samples at seams."""
    L = 3000
    t = np.arange(L)
    sig = np.sin(2 * np.pi * t / 230).astype(np.float32)
    spans = [(0, 1000), (1000, 2000), (2000, L)]
    ov = 120
    pieces = []
    for a, b in spans:
        a2, b2 = max(0, a - ov), min(L, b + ov)
        pieces.append((sig[a2:b2], a - a2, b2 - b))
    out = crossfade_concat(pieces)
    assert len(out) == L, len(out)
    np.testing.assert_allclose(out, sig, atol=1e-6)


def test_run_clip_fused_branch(tmp_path, monkeypatch):
    """--fused routes every voiced chunk through Svc.infer_fused (with the
    shallow-diffusion kwargs), resamples the chunk to the model rate, and
    keeps the exact-length output contract of the modular path."""
    from types import SimpleNamespace

    from infer import run_clip
    from diffsvc_tpu.utils.audio_io import save_wav

    sr_in, sr_model = 8000, 16000
    t = np.arange(int(sr_in * 2.0)) / sr_in
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav[6000:10000] = 0.0  # silence gap for the slicer
    src = tmp_path / "song.wav"
    save_wav(wav, str(src), sr_in)

    calls = []

    def fake_infer_fused(w, key=0, acc=20, use_gt_mel=False,
                         add_noise_step=500, **kw):
        calls.append(dict(n=len(w), key=key, acc=acc, use_gt_mel=use_gt_mel,
                          add_noise_step=add_noise_step))
        n_frames = -(-len(w) // 64)
        # int16 wire format, as fused_output_int16 serving produces
        out = np.round(np.clip(w, -1, 1) * 32767.0).astype(np.int16)
        return out, np.full(n_frames, 220.0, np.float32), None

    svc_model = SimpleNamespace(
        hp={"audio_sample_rate": sr_model, "hop_size": 64,
            "residual_channels": 8, "residual_layers": 2},
        infer_fused=fake_infer_fused)
    monkeypatch.chdir(tmp_path)
    out_path = tmp_path / "out.wav"
    run_clip(svc_model, key=2, acc=10, use_pe=True, use_crepe=False,
             thre=0.05, use_gt_mel=True, add_noise_step=123,
             file_path=str(src), out_path=str(out_path), fused=True)

    assert calls, "fused branch never invoked"
    for c in calls:
        assert c["key"] == 2 and c["acc"] == 10
        assert c["use_gt_mel"] and c["add_noise_step"] == 123
    # --fused sets a default bucket to bound per-length recompiles
    assert svc_model.hp["fused_bucket_samples"] == 64 * 256
    from scipy.io import wavfile

    sr_out, audio = wavfile.read(str(out_path))
    assert sr_out == sr_model
    # exact-length contract: ratio 1.0 vs the input duration at model rate
    assert len(audio) == int(np.ceil(len(wav) / sr_in * sr_model))
