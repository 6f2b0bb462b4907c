"""TextGrid parsing + forced-alignment mel2ph.

Behavior target: reference preprocessing/data_gen_utils.py:243-383.
The reference's caller is disabled upstream (base_binarizer.py:198-203),
so these tests pin OUR implementation against hand-computed alignments
on synthetic MFA-style TextGrids.
"""

import numpy as np
import pytest

from diffsvc_tpu.data import textgrid as tg


def _make_textgrid(intervals, xmax=None):
    """Long-format TextGrid text with one IntervalTier named 'phones'."""
    xmax = xmax if xmax is not None else intervals[-1][1]
    lines = [
        'File type = "ooTextFile"',
        'Object class = "TextGrid"',
        "",
        "xmin = 0.0",
        f"xmax = {xmax}",
        "tiers? <exists>",
        "size = 1",
        "item []:",
        "    item [1]:",
        '        class = "IntervalTier"',
        '        name = "phones"',
        "        xmin = 0.0",
        f"        xmax = {xmax}",
        f"        intervals: size = {len(intervals)}",
    ]
    for i, (a, b, t) in enumerate(intervals):
        lines += [f"        intervals [{i + 1}]",
                  f"            xmin = {a}",
                  f"            xmax = {b}",
                  f'            text = "{t}"']
    return "\n".join(lines)


HP = {"audio_sample_rate": 1000, "hop_size": 100}  # 1 frame = 0.1 s


def test_parse_textgrid_structure():
    text = _make_textgrid([(0.0, 0.2, "sil"), (0.2, 0.5, "AA"),
                           (0.5, 0.8, "B"), (0.8, 1.0, "")])
    tiers = tg.parse_textgrid(text)
    assert len(tiers) == 1
    t = tiers[0]
    assert t.name == "phones"
    assert [iv.text for iv in t.intervals] == ["sil", "AA", "B", ""]
    assert t.intervals[1] == tg.Interval(0.2, 0.5, "AA")


def test_parse_rejects_non_interval_tier():
    text = _make_textgrid([(0.0, 1.0, "x")]).replace(
        "IntervalTier", "TextTier")
    with pytest.raises(ValueError, match="IntervalTier"):
        tg.parse_textgrid(text)


def test_merge_silences_coalesces_adjacent():
    ivs = [tg.Interval(0.0, 0.1, "sp"), tg.Interval(0.1, 0.2, "SIL"),
           tg.Interval(0.2, 0.5, "AA"), tg.Interval(0.5, 0.6, ""),
           tg.Interval(0.6, 0.7, "PUNC")]
    merged = tg._merge_silences(ivs)
    assert merged == [tg.Interval(0.0, 0.2, ""),
                      tg.Interval(0.2, 0.5, "AA"),
                      tg.Interval(0.5, 0.7, "")]


def test_get_mel2ph_basic(tmp_path):
    # <sil> AA B <sil>, 1.0 s total, frames of 0.1 s
    text = _make_textgrid([(0.0, 0.2, "sil"), (0.2, 0.5, "AA"),
                           (0.5, 0.8, "B"), (0.8, 1.0, "sp")])
    p = tmp_path / "a.TextGrid"
    p.write_text(text)
    mel2ph, dur = tg.get_mel2ph(str(p), "<sil> AA B <sil>", 10, HP)
    # splits at 0.0 / 0.2 / 0.5 / 0.8 -> frames 0,2,5,8
    want = np.array([1, 1, 2, 2, 2, 3, 3, 3, 4, 4])
    np.testing.assert_array_equal(mel2ph, want)
    np.testing.assert_array_equal(dur, [2, 3, 3, 2])


def test_get_mel2ph_zero_length_sil_backfill(tmp_path):
    # phoneme list has a silence between AA and B, but the TextGrid has
    # no silence interval there -> the sil phoneme collapses to zero
    # frames at B's start (reference back-fill, data_gen_utils.py:365-366)
    text = _make_textgrid([(0.0, 0.5, "AA"), (0.5, 1.0, "B")])
    p = tmp_path / "b.TextGrid"
    p.write_text(text)
    mel2ph, dur = tg.get_mel2ph(str(p), "AA <sp> B", 10, HP)
    want = np.array([1, 1, 1, 1, 1, 3, 3, 3, 3, 3])
    np.testing.assert_array_equal(mel2ph, want)
    np.testing.assert_array_equal(dur, [5, 0, 5])


def test_get_mel2ph_trailing_silence_phoneme(tmp_path):
    # trailing sil phoneme with no trailing interval absorbs nothing
    text = _make_textgrid([(0.0, 0.6, "AA"), (0.6, 1.0, "")])
    p = tmp_path / "c.TextGrid"
    p.write_text(text)
    mel2ph, dur = tg.get_mel2ph(str(p), "AA <sil> <sil>", 10, HP)
    # AA: frames 0-5, first sil: 0.6..end-sentinel, second sil: zero tail
    np.testing.assert_array_equal(mel2ph, [1, 1, 1, 1, 1, 1, 2, 2, 2, 2])
    np.testing.assert_array_equal(dur, [6, 4, 0])


def test_get_mel2ph_count_mismatch_raises(tmp_path):
    text = _make_textgrid([(0.0, 0.5, "AA"), (0.5, 1.0, "B")])
    p = tmp_path / "d.TextGrid"
    p.write_text(text)
    with pytest.raises(ValueError, match="mismatch"):
        tg.get_mel2ph(str(p), "AA B C", 10, HP)


def test_get_mel2ph_text_mismatch_raises(tmp_path):
    text = _make_textgrid([(0.0, 0.5, "AA"), (0.5, 1.0, "B")])
    p = tmp_path / "e.TextGrid"
    p.write_text(text)
    with pytest.raises(ValueError, match="alignment text"):
        tg.get_mel2ph(str(p), "AA C", 10, HP)


def test_process_item_uses_textgrid_when_given(tmp_path, monkeypatch):
    """features.process_item routes to forced alignment when tg_fn/ph are
    in the metadata (and stays uniform otherwise)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.data import features
    from diffsvc_tpu.utils.audio_io import save_wav

    sr = 8000
    hp = HParams(
        audio_sample_rate=sr, hop_size=200, fft_size=400, win_size=400,
        audio_num_mel_bins=8, fmin=0, fmax=4000, min_level_db=-100,
        f0_min=50, f0_max=600, f0_bin=256, vocoder="pwg",
        binarization_args={"with_f0": False, "with_hubert": True,
                           "with_align": True},
    )
    t = np.arange(sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav_fn = str(tmp_path / "u.wav")
    save_wav(wav, wav_fn, sr)

    def fake_encode(_fn):
        return np.zeros((20, 4), np.float32)

    item_u = features.process_item("u", wav_fn, hp, fake_encode)
    n_frames = item_u["mel"].shape[0]

    dur_s = n_frames * 200 / sr
    text = _make_textgrid([(0.0, dur_s / 2, "AA"), (dur_s / 2, dur_s, "B")])
    tg_fn = str(tmp_path / "u.TextGrid")
    open(tg_fn, "w").write(text)
    item_tg = features.process_item("u", wav_fn, hp, fake_encode,
                                    tg_fn=tg_fn, ph="AA B")
    m2p = item_tg["mel2ph"]
    assert m2p.shape[0] == n_frames
    assert set(np.unique(m2p)) <= {1, 2}
    assert "dur" in item_tg and item_tg["dur"].sum() == n_frames
    # uniform path differs (20 hubert units -> values beyond 2)
    assert item_u["mel2ph"].max() > 2


def test_get_mel2ph_two_consecutive_sils_backfill(tmp_path):
    # TWO silence phonemes between AA and B, no silence interval in the
    # grid (silences merged away): BOTH must collapse to zero frames at
    # B's start — back-fill walks past every pending silence, not just
    # the most recent one
    text = _make_textgrid([(0.0, 0.5, "AA"), (0.5, 1.0, "B")])
    p = tmp_path / "e.TextGrid"
    p.write_text(text)
    mel2ph, dur = tg.get_mel2ph(str(p), "AA <sp> <sil> B", 10, HP)
    np.testing.assert_array_equal(mel2ph, [1, 1, 1, 1, 1, 4, 4, 4, 4, 4])
    np.testing.assert_array_equal(dur, [5, 0, 0, 5])
