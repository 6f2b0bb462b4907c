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
