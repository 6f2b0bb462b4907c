"""Click-free streaming continuity (beyond reference).

The reference realtime service (ref flask_api.py:19-54) converts every
DAW buffer independently, so consecutive buffers meet with a phase/
timbre discontinuity.  StreamingConverter removes it with left context +
a held-tail crossfade.  These tests pin the timing contract, exactness
under a stateless converter, and the click-metric improvement under a
deliberately discontinuous converter.
"""

import numpy as np
import pytest

from diffsvc_tpu.infer.streaming import StreamingConverter, boundary_jump

SR = 8000


def _sine(n, f=220.0, phase0=0.0):
    return (0.3 * np.sin(phase0 + 2 * np.pi * f * np.arange(n) / SR)
            ).astype(np.float32)


def test_timing_contract():
    sc = StreamingConverter(lambda x: x, SR, context_ms=100.0,
                            crossfade_ms=40.0)
    C = sc.C
    bufs = [np.zeros(1600, np.float32), np.zeros(2000, np.float32),
            np.zeros(1600, np.float32)]
    outs = [sc(b) for b in bufs]
    assert [len(o) for o in outs] == [1600 - C, 2000, 1600]
    tail = sc.flush()
    assert len(tail) == C
    assert sum(map(len, outs)) + len(tail) == sum(map(len, bufs))
    # flush resets: the next call starts a new stream (short again)
    assert len(sc(bufs[0])) == 1600 - C


def test_identity_converter_is_exact():
    """Two renders of the same span under a stateless converter are
    identical, so the equal-gain blend reproduces them exactly: the
    stream is the input, delayed by nothing (identity), sample-exact."""
    sc = StreamingConverter(lambda x: x, SR, context_ms=100.0,
                            crossfade_ms=40.0)
    x = _sine(6400)
    chunks = [sc(b) for b in np.split(x, 4)]
    chunks.append(sc.flush())
    np.testing.assert_array_equal(np.concatenate(chunks), x)


def test_left_context_heals_corrupt_buffer_head():
    """A converter whose output is garbage for its first few ms (e.g. a
    filter warming up from a zero boundary) is healed as long as the
    garbage is shorter than context - crossfade: the corrupt span falls
    entirely in the discarded left context, before the redo window."""
    bad = int(SR * 0.05)  # 50 ms < context(100) - crossfade(40)

    def convert(x):
        y = x.copy()
        y[: min(bad, len(y))] = 0.0  # corrupt head
        return y

    sc = StreamingConverter(convert, SR, context_ms=100.0, crossfade_ms=40.0)
    x = _sine(6400)
    bufs = np.split(x, 4)
    outs = [sc(b) for b in bufs]
    # the first chunk's head is corrupt (no history exists yet); every
    # sample after it is converted with real history: exact
    got = np.concatenate(outs[1:] + [sc.flush()])
    np.testing.assert_array_equal(got, x[len(outs[0]):])


def test_crossfade_removes_boundary_clicks():
    """Per-call DC jumps (a stand-in for the per-buffer timbre/phase
    discontinuity of independent conversion) produce large boundary
    steps naively; the held-tail crossfade spreads them below the
    audible-click scale."""
    k = [0]

    def convert(x):
        k[0] += 1
        return x + (0.2 if k[0] % 2 else -0.2)

    x = _sine(6400)
    bufs = np.split(x, 4)

    k[0] = 0
    naive = [convert(b) for b in bufs]
    naive_jump = boundary_jump(naive)
    assert naive_jump > 0.3  # the click is real

    k[0] = 0
    sc = StreamingConverter(convert, SR, context_ms=100.0, crossfade_ms=40.0)
    outs = [sc(b) for b in bufs] + [sc.flush()]
    streamed = np.concatenate(outs)
    # measure the largest step anywhere in the stream (not just at the
    # emission boundaries — the blend must not move the click inward)
    sig_step = np.abs(np.diff(x)).max()
    worst = np.abs(np.diff(streamed)).max()
    # excess step over the signal's own slope: the 0.4 DC swing is spread
    # over the C-sample raised-cosine ramp (peak slope pi/2 * mean)
    excess = worst - sig_step
    assert excess < 2 * 0.4 / sc.C
    assert excess < naive_jump / 50


def test_validation_errors():
    with pytest.raises(ValueError):
        StreamingConverter(lambda x: x, SR, context_ms=20.0,
                           crossfade_ms=40.0)


def test_sub_crossfade_buffers_accumulate():
    """Buffers shorter than the crossfade (typical DAW 256-1024 sample
    blocks vs the 40 ms = 1764-sample default) accumulate internally and
    emit once a crossfade length is available; no sample is dropped."""
    sc = StreamingConverter(lambda x: x, SR, crossfade_ms=40.0)
    rng = np.random.RandomState(0)
    sig = rng.randn(SR).astype(np.float32)
    out, n_in = [], 0
    block = 512  # < sc.C
    for i in range(0, len(sig) - block + 1, block):
        y = sc(sig[i: i + block])
        n_in += block
        out.append(y)
    out.append(sc.flush())
    got = np.concatenate(out)
    assert len(got) == n_in
    np.testing.assert_allclose(got, sig[:n_in], rtol=1e-6, atol=1e-7)


def test_sub_crossfade_only_stream_flush():
    sc = StreamingConverter(lambda x: x, SR, crossfade_ms=40.0)
    sig = np.arange(100, dtype=np.float32)
    assert len(sc(sig)) == 0
    np.testing.assert_array_equal(sc.flush(), sig)
