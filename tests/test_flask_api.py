"""HTTP service layer: multipart parsing, inference dispatch, wav response."""

import io
import threading
import urllib.request
from http.server import HTTPServer

import numpy as np
from scipy.io import wavfile

from flask_api import make_handler


class FakeModel:
    hp = {"audio_sample_rate": 8000, "hop_size": 64}

    def infer(self, input_wav, key, acc, use_pe, use_crepe):
        sr, data = wavfile.read(input_wav)
        wav = data.astype(np.float32) / 32768.0
        self.last_key = key
        return np.zeros(10), np.zeros(10), wav * 0.5


def _multipart(fields, file_bytes):
    boundary = "testboundary123"
    body = b""
    for k, v in fields.items():
        body += (f"--{boundary}\r\nContent-Disposition: form-data; "
                 f'name="{k}"\r\n\r\n{v}\r\n').encode()
    body += (f"--{boundary}\r\nContent-Disposition: form-data; "
             f'name="sample"; filename="in.wav"\r\n'
             "Content-Type: audio/wav\r\n\r\n").encode()
    body += file_bytes + f"\r\n--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


def test_voice_change_endpoint():
    model = FakeModel()
    server = HTTPServer(("127.0.0.1", 0), make_handler(model, accelerate=50))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        sr = 8000
        wav = (0.4 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
        buf = io.BytesIO()
        wavfile.write(buf, sr, (wav * 32767).astype(np.int16))
        body, ctype = _multipart({"fPitchChange": "2", "sampleRate": "16000"},
                                 buf.getvalue())
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/voiceChangeModel", data=body,
            headers={"Content-Type": ctype}, method="POST")
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200
            out_bytes = resp.read()
        out_sr, out = wavfile.read(io.BytesIO(out_bytes))
        assert out_sr == 16000  # resampled to the DAW rate
        assert len(out) > 0
        assert model.last_key == 2.0
    finally:
        server.shutdown()


def test_streaming_mode_keeps_buffer_duration_and_continuity():
    """--stream serving: every response keeps the posted buffer's
    duration (the first is zero-padded at the head by the crossfade
    delay), and the concatenated stream is the converted signal —
    continuous across buffer boundaries."""
    from flask_api import make_handler, make_stream

    model = FakeModel()
    stream = make_stream(model, acc=50, fused=False,
                         context_ms=100.0, crossfade_ms=40.0)
    server = HTTPServer(("127.0.0.1", 0),
                        make_handler(model, accelerate=50, stream=stream))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        sr = 8000
        n = 1600
        x = (0.4 * np.sin(2 * np.pi * 220 * np.arange(3 * n) / sr)
             ).astype(np.float32)
        got = []
        for k in range(3):
            buf = io.BytesIO()
            wavfile.write(buf, sr,
                          (x[k * n:(k + 1) * n] * 32767).astype(np.int16))
            body, ctype = _multipart(
                {"fPitchChange": "0", "sampleRate": str(sr)}, buf.getvalue())
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/voiceChangeModel", data=body,
                headers={"Content-Type": ctype}, method="POST")
            with urllib.request.urlopen(req, timeout=30) as resp:
                out_sr, out = wavfile.read(io.BytesIO(resp.read()))
            assert out_sr == sr
            assert len(out) == n  # duration contract holds per buffer
            got.append(out.astype(np.float32) / 32767.0)
        y = np.concatenate(got)
        C = stream.C
        # head: the crossfade delay, emitted as silence on buffer 0
        assert np.all(got[0][:C] == 0)
        # body: the converted (0.5x) signal, delayed by C, with no
        # boundary artifacts (FakeModel is stateless, so the blend is
        # exact up to two int16 round trips)
        np.testing.assert_allclose(y[C:], 0.5 * x[: 3 * n - C], atol=2e-4)
    finally:
        server.shutdown()


def test_streaming_sub_crossfade_buffers_keep_duration_and_continuity():
    """256-1024-sample DAW blocks are BELOW the 40 ms crossfade: the
    converter accumulates them and releases output in bursts. The
    handler's output FIFO must still return exactly the posted duration
    per response — all-zero responses while the stream fills (constant
    latency <= 2 crossfades + one block), then continuous audio with no
    mid-stream silence gaps (the concatenated tail IS the converted
    signal, sample-contiguous)."""
    from flask_api import make_handler, make_stream

    model = FakeModel()
    stream = make_stream(model, acc=50, fused=False,
                         context_ms=100.0, crossfade_ms=40.0)
    server = HTTPServer(("127.0.0.1", 0),
                        make_handler(model, accelerate=50, stream=stream))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        sr = 8000
        n = 100                      # << C = 320 samples @ 40 ms
        k_bufs = 20
        # cos: nonzero at t=0, so the leading-zero count IS the latency
        x = (0.4 * np.cos(2 * np.pi * 220 * np.arange(k_bufs * n) / sr)
             ).astype(np.float32)
        got = []
        for k in range(k_bufs):
            buf = io.BytesIO()
            wavfile.write(buf, sr,
                          (x[k * n:(k + 1) * n] * 32767).astype(np.int16))
            body, ctype = _multipart(
                {"fPitchChange": "0", "sampleRate": str(sr)}, buf.getvalue())
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/voiceChangeModel", data=body,
                headers={"Content-Type": ctype}, method="POST")
            with urllib.request.urlopen(req, timeout=30) as resp:
                out_sr, out = wavfile.read(io.BytesIO(resp.read()))
            assert out_sr == sr
            assert len(out) == n     # duration contract holds per buffer
            got.append(out.astype(np.float32) / 32767.0)
        y = np.concatenate(got)
        nz = np.nonzero(y)[0]
        assert len(nz), "stream never released any audio"
        d = nz[0]                    # constant fill latency
        C = stream.C
        assert d <= 2 * C + n, f"fill latency {d} > 2 crossfades + block"
        # after the fill, the stream is gapless: the tail is the converted
        # (0.5x) signal from t=0, delayed by d, up to int16 round trips
        np.testing.assert_allclose(y[d:], 0.5 * x[: len(y) - d], atol=2e-4)
    finally:
        server.shutdown()


def test_streaming_idle_reset_restarts_the_stream():
    """A request gap longer than idle_reset_s flushes the held tail and
    context (a paused DAW): both buffers around the gap are served as
    fresh stream starts (head-padded by the crossfade delay), so stale
    audio from the previous take is never blended into the new one."""
    import time

    from flask_api import make_handler, make_stream

    model = FakeModel()
    stream = make_stream(model, acc=50, fused=False, context_ms=100.0,
                         crossfade_ms=40.0, idle_reset_s=0.05)
    server = HTTPServer(("127.0.0.1", 0),
                        make_handler(model, accelerate=50, stream=stream))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        sr = 8000
        n = 1600
        C = stream.C
        got = []
        for k in range(2):
            x = (0.4 * np.sin(2 * np.pi * (220 + 40 * k)
                              * np.arange(n) / sr)).astype(np.float32)
            buf = io.BytesIO()
            wavfile.write(buf, sr, (x * 32767).astype(np.int16))
            body, ctype = _multipart(
                {"fPitchChange": "0", "sampleRate": str(sr)}, buf.getvalue())
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/voiceChangeModel", data=body,
                headers={"Content-Type": ctype}, method="POST")
            with urllib.request.urlopen(req, timeout=30) as resp:
                _, out = wavfile.read(io.BytesIO(resp.read()))
            got.append((x, out.astype(np.float32) / 32767.0))
            time.sleep(0.15)  # > idle_reset_s: the stream restarts
        for x, out in got:
            assert len(out) == n
            assert np.all(out[:C] == 0)  # fresh-stream head delay
            np.testing.assert_allclose(out[C:], 0.5 * x[: n - C], atol=2e-4)
    finally:
        server.shutdown()


def test_warmup_fused_compiles_every_bucket():
    """--warmup pre-compiles each fused length bucket (ceil(max_s*sr /
    bucket) silent buffers, each padded UP to its own bucket) before the
    server accepts requests."""
    from flask_api import warmup_fused

    calls = []

    class FakeFused:
        hp = {"audio_sample_rate": 8000, "hop_size": 64,
              "fused_bucket_samples": 4000}

        def infer_fused(self, wav, key, acc):
            calls.append(len(wav))
            return np.zeros(len(wav), np.int16), np.zeros(10), np.zeros(10)

    n = warmup_fused(FakeFused(), acc=50, max_seconds=1.2)
    # 1.2 s * 8000 = 9600 samples over 4000-sample buckets -> 3 buckets
    assert n == 3
    assert calls == [4000, 8000, 12000]


def _post(port, body, ctype):
    import urllib.error

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/voiceChangeModel", data=body,
        headers={"Content-Type": ctype}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status
    except urllib.error.HTTPError as e:
        return e.code


def test_malformed_uploads_return_clean_http_errors():
    """Input robustness the reference lacks (ref flask_api.py:19-38 has
    zero error handling): truncated wav, wrong content type, absurd or
    non-numeric fPitchChange, missing sample -> 4xx, never a hang or
    an opaque 500; the server keeps serving afterwards."""
    model = FakeModel()
    server = HTTPServer(("127.0.0.1", 0), make_handler(model, accelerate=50))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        sr = 8000
        wav = (0.1 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr))
        buf = io.BytesIO()
        wavfile.write(buf, sr, (wav * 32767).astype(np.int16))
        good = buf.getvalue()

        # wrong content type
        assert _post(port, b"x", "application/json") == 400

        # truncated wav payload (header cut mid-way)
        body, ctype = _multipart({"fPitchChange": "0", "sampleRate": "8000"},
                                 good[:40])
        assert _post(port, body, ctype) == 400

        # non-numeric pitch
        body, ctype = _multipart({"fPitchChange": "not-a-number",
                                  "sampleRate": "8000"}, good)
        assert _post(port, body, ctype) == 400

        # absurd pitch (beyond +-48 semitones) and non-finite
        for bad in ("4800", "nan", "inf"):
            body, ctype = _multipart({"fPitchChange": bad,
                                      "sampleRate": "8000"}, good)
            assert _post(port, body, ctype) == 400, bad

        # bad sample rate
        body, ctype = _multipart({"fPitchChange": "0", "sampleRate": "0"},
                                 good)
        assert _post(port, body, ctype) == 400

        # missing sample field entirely
        boundary = "testboundary123"
        body = (f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="fPitchChange"\r\n\r\n0\r\n--{boundary}--\r\n').encode()
        assert _post(port, body,
                     f"multipart/form-data; boundary={boundary}") == 400

        # server still healthy: a good request succeeds after all that
        body, ctype = _multipart({"fPitchChange": "1", "sampleRate": "8000"},
                                 good)
        assert _post(port, body, ctype) == 200
    finally:
        server.shutdown()


def test_server_side_failures_are_500_not_400():
    """A valid upload that hits a genuine server bug (KeyError/ValueError
    raised INSIDE the pipeline, e.g. a missing hp key) must surface as
    500, not be misclassified as a 'bad wav upload' client error —
    decode and inference are separate try blocks in the handler."""

    class BrokenModel:
        hp = {"audio_sample_rate": 8000, "hop_size": 64}

        def infer(self, input_wav, key, acc, use_pe, use_crepe):
            raise KeyError("residual_channels")  # server-side defect

    server = HTTPServer(("127.0.0.1", 0),
                        make_handler(BrokenModel(), accelerate=50))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        sr = 8000
        wav = 0.1 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
        buf = io.BytesIO()
        wavfile.write(buf, sr, (wav * 32767).astype(np.int16))
        body, ctype = _multipart({"fPitchChange": "0", "sampleRate": "8000"},
                                 buf.getvalue())
        assert _post(port, body, ctype) == 500
    finally:
        server.shutdown()
