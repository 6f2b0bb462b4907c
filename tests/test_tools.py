import numpy as np

from diffsvc_tpu.utils.multiprocess import chunked_multiprocess_run


def _square(x):
    return x * x


def test_chunked_multiprocess_run_ordered():
    res = list(chunked_multiprocess_run(_square, [(i,) for i in range(10)],
                                        num_workers=3))
    assert res == [(i, i * i) for i in range(10)]


def test_compare_mel_mcd():
    import sys

    sys.path.insert(0, "tools")
    from compare_mel import compare_mels, mel_mcd

    rng = np.random.RandomState(0)
    a = rng.randn(100, 80).astype(np.float32)
    stats = compare_mels(a, a)
    assert stats["mcd_db"] == 0.0
    stats2 = compare_mels(a, a + 0.01)
    assert 0 < stats2["mcd_db"] < 0.5
    stats3 = compare_mels(a, rng.randn(100, 80))
    assert stats3["mcd_db"] > 1.0
    # length mismatch handled
    assert compare_mels(a, a[:50])["frames"] == 50


def test_cwt_f0_reconstruction_roundtrip():
    """pitch_type: cwt path — decompose a smooth f0 curve, reconstruct via
    cwt2f0 with the utterance lf0 stats (reference utils/cwt.py:137-147):
    the z-norm + rescale must recover the curve's scale and shape."""
    import numpy as np

    from diffsvc_tpu.ops.cwt import get_cont_lf0, get_lf0_cwt, norm_scale, cwt2f0

    t = np.arange(400) * 0.005
    f0 = 220.0 * 2 ** (0.3 * np.sin(2 * np.pi * 5.0 * t))  # 5 Hz vibrato
    uv, lf0 = get_cont_lf0(f0)
    lmean, lstd = lf0.mean(), lf0.std()
    W, scales = get_lf0_cwt((lf0 - lmean) / lstd)
    Wn, _, _ = norm_scale(W)
    rec = cwt2f0(Wn, lmean, lstd, scales)
    assert rec.shape == f0.shape
    # reconstruction from 10 dyadic scales is approximate: demand high
    # correlation and the correct overall register
    c = np.corrcoef(np.log(rec), np.log(f0))[0, 1]
    assert c > 0.85, c
    assert abs(np.log(rec).mean() - np.log(f0).mean()) < 0.1


def test_trans_key_move_key_and_f0():
    """12-tone transpose helper (reference trans_key.py surface): octave
    carries in both directions and the 2^(k/12) f0 scaling."""
    import trans_key as tk

    assert tk.move_key("A4", 3) == "C5"
    assert tk.move_key("C4", -1) == "B3"
    assert tk.move_key("B3", 1) == "C4"
    assert tk.move_key("C4", -13) == "B2"
    assert tk.move_key("A#4", 14) == "C6"
    assert tk.move_key("D5", 0) == "D5"
    assert tk.trans_f0_seq(440.0, 12) == 880.0
    assert tk.trans_f0_seq(440.0, -12) == 220.0
    rows = [{"note_seq": "A4 rest C5", "f0_seq": "440.0 0.0 523.3"}]
    out = tk.trans_key(rows, 2)
    assert out[0]["note_seq"] == "B4 rest D5"
    assert out[0]["f0_seq"].split()[1] == "0.0"
