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
