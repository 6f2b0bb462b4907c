"""Serving soak: N minutes of mixed-length/mixed-key POSTs through the
real flask_api HTTP stack (VERDICT r4 #7).

Drives the exact production serving path — ``flask_api.make_handler`` on
an ``HTTPServer``, multipart PCM16 uploads to ``/voiceChangeModel`` —
with a client mix a DAW/VST fleet would produce: buffer durations drawn
from ``--durs``, pitch keys from ``--keys``, at ``--concurrency`` client
threads (the server itself is single-threaded by design, ref
flask_api.py:19-38 has no concurrency either; extra clients measure
queueing on top of service time). Two legs:

- non-stream (independent per-buffer conversion, the reference protocol),
- --stream (click-free continuous mode; sequential by construction).

Reported per leg: request count, error count, p50/p95/p99 wall latency
per duration and overall, and RECOMPILES AFTER WARMUP — the fused
per-length program cache (FusedSvc._fns) is sized after flask_api's
warmup_fused pass and again after the soak; any growth means a live
request ate a 20-70 s tunnel compile, which the bucket math is supposed
to make impossible.

Uses random weights at production dims (same recipe as bench.py — soak
measures serving behavior, not audio quality). Writes
runs/soak_serving/summary.json and prints one JSON line on stdout.

Usage: python tools/soak_serving.py [--minutes 4] [--smoke]
"""

import argparse
import http.client
import json
import os
import sys
import threading
import time
import uuid

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pct(xs, q):
    return float(np.percentile(np.asarray(xs, np.float64), q)) if xs else None


class SvcLike:
    """The surface flask_api needs from Svc (hp + infer_fused), backed by
    a directly-constructed FusedSvc — same recipe as bench.py, no
    checkpoint files involved."""

    def __init__(self, hp, fused):
        self.hp = hp
        self._fused = fused

    def infer_fused(self, wav, key=0, acc=20, use_gt_mel=False,
                    add_noise_step=500):
        return self._fused(np.asarray(wav), key_shift=int(key),
                           use_gt_mel=use_gt_mel,
                           add_noise_step=add_noise_step)


def make_wav_bytes(dur_s, sr, seed):
    """Synthetic vocal-ish PCM16 wav bytes at the model rate."""
    import io

    from scipy.io import wavfile

    rng = np.random.RandomState(seed)
    t = np.arange(int(sr * dur_s)) / sr
    f0 = rng.uniform(150, 330) * (1 + 0.03 * np.sin(2 * np.pi * 5.0 * t))
    ph = np.cumsum(2 * np.pi * f0 / sr)
    w = (0.3 * np.sin(ph) + 0.15 * np.sin(2 * ph)
         + 0.02 * rng.randn(len(t))).astype(np.float32)
    buf = io.BytesIO()
    wavfile.write(buf, sr, (np.clip(w, -1, 1) * 32767).astype(np.int16))
    return buf.getvalue()


def post(port, wav_bytes, key, daw_sr, timeout=600.0):
    boundary = uuid.uuid4().hex
    parts = []
    for name, val in (("fPitchChange", str(key)), ("sampleRate", str(daw_sr))):
        parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                     f"name=\"{name}\"\r\n\r\n{val}\r\n".encode())
    parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                 f"name=\"sample\"; filename=\"b.wav\"\r\nContent-Type: "
                 f"audio/wav\r\n\r\n".encode() + wav_bytes + b"\r\n")
    parts.append(f"--{boundary}--\r\n".encode())
    body = b"".join(parts)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    t0 = time.time()
    conn.request("POST", "/voiceChangeModel", body=body, headers={
        "Content-Type": f"multipart/form-data; boundary={boundary}"})
    resp = conn.getresponse()
    data = resp.read()
    wall = time.time() - t0
    conn.close()
    return resp.status, len(data), wall


def run_leg(name, model, acc, durs, keys, minutes, concurrency, port,
            stream=False):
    from http.server import HTTPServer

    import flask_api

    stream_obj = (flask_api.make_stream(model, acc, fused=True)
                  if stream else None)
    handler = flask_api.make_handler(model, acc, fused=True,
                                     stream=stream_obj)
    server = HTTPServer(("127.0.0.1", port), handler)
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()

    sr = model.hp["audio_sample_rate"]
    fns_before = len(model._fused._fns)
    lat = {d: [] for d in durs}
    errors = []
    stop_t = time.time() + minutes * 60.0
    lock = threading.Lock()
    counter = [0]

    def client(tid):
        while time.time() < stop_t:
            with lock:
                i = counter[0]
                counter[0] += 1
            # stream legs keep one duration (a DAW posts fixed buffers);
            # non-stream cycles the mix deterministically
            d = durs[0] if stream else durs[i % len(durs)]
            k = keys[i % len(keys)]
            wav_bytes = make_wav_bytes(d, sr, seed=i)
            try:
                status, nbytes, wall = post(port, wav_bytes, k, sr)
                if status != 200 or nbytes < 44:
                    errors.append((d, k, status, nbytes))
                else:
                    with lock:
                        lat[d].append(wall)
            except Exception as e:  # pragma: no cover
                errors.append((d, k, "exc", str(e)))

    threads = [threading.Thread(target=client, args=(j,))
               for j in range(1 if stream else concurrency)]
    t0 = time.time()
    for c in threads:
        c.start()
    for c in threads:
        c.join()
    elapsed = time.time() - t0
    server.shutdown()
    fns_after = len(model._fused._fns)

    n = sum(len(v) for v in lat.values())
    allv = [x for v in lat.values() for x in v]
    leg = {
        "requests": n, "errors": len(errors), "elapsed_s": round(elapsed, 1),
        "concurrency": 1 if stream else concurrency,
        "recompiles_after_warmup": fns_after - fns_before,
        "overall": {"p50_ms": round(pct(allv, 50) * 1e3, 1),
                    "p95_ms": round(pct(allv, 95) * 1e3, 1),
                    "p99_ms": round(pct(allv, 99) * 1e3, 1)} if allv else None,
        "per_dur": {str(d): {
            "n": len(v),
            "p50_ms": round(pct(v, 50) * 1e3, 1),
            "p95_ms": round(pct(v, 95) * 1e3, 1),
            "p99_ms": round(pct(v, 99) * 1e3, 1),
        } for d, v in lat.items() if v},
    }
    log(f"| leg {name}: {n} reqs in {elapsed:.0f}s, {len(errors)} errors, "
        f"{leg['recompiles_after_warmup']} recompiles, "
        f"overall p50/p95/p99 = "
        + (f"{leg['overall']['p50_ms']}/{leg['overall']['p95_ms']}/"
           f"{leg['overall']['p99_ms']} ms" if allv else "n/a"))
    if errors[:3]:
        log(f"|   first errors: {errors[:3]}")
    return leg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=4.0,
                    help="soak duration PER LEG")
    ap.add_argument("--acc", type=int, default=50,
                    help="pndm_speedup for serving (reference realtime "
                         "protocol uses acc from the VST; 50 -> 20 NFE)")
    ap.add_argument("--durs", default="0.2,0.5,1.0,3.0")
    ap.add_argument("--keys", default="-5,0,3,12")
    ap.add_argument("--concurrency", type=int, default=2)
    ap.add_argument("--port", type=int, default=16842)
    ap.add_argument("--out", default=None,
                    help="output dir (default: runs/soak_serving, or "
                         "runs/soak_serving_smoke with --smoke — the CPU "
                         "smoke must never clobber a committed TPU artifact)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny dims on CPU, seconds-long legs")
    args = ap.parse_args()
    if args.out is None:
        args.out = os.path.join(
            REPO, "runs/soak_serving_smoke" if args.smoke
            else "runs/soak_serving")

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from diffsvc_tpu.utils.compile_cache import enable as _cc

    _cc()
    import jax

    import flask_api
    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.infer.fused import FusedSvc
    from diffsvc_tpu.models import hubert as hubert_model
    from diffsvc_tpu.models.diffusion import GaussianDiffusion
    from diffsvc_tpu.vocoders import generator as gen

    log(f"| device: {jax.devices()[0]}")

    SR, HOP, NFFT, NMEL = 44100, 512, 2048, 128
    RES_CH, RES_L, VOC_CH = 384, 20, 512
    minutes = args.minutes
    if args.smoke:
        RES_CH, RES_L, VOC_CH = 32, 4, 64
        minutes = min(minutes, 0.25)

    hp = HParams(
        audio_sample_rate=SR, audio_num_mel_bins=NMEL, fft_size=NFFT,
        hop_size=HOP, win_size=NFFT, fmin=40, fmax=16000,
        hidden_size=256, residual_layers=RES_L, residual_channels=RES_CH,
        dilation_cycle_length=4, timesteps=1000, K_step=1000,
        diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=NMEL, spec_min=[-5.0], spec_max=[0.0], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=False, use_spk_id=False,
        use_spk_embed=False, use_uv=False, pitch_norm="log", f0_bin=256,
        f0_min=40.0, f0_max=1100.0, pndm_speedup=args.acc, use_nsf=True,
        vocoder="NsfHifiGAN",
        # serving wire flags BEFORE FusedSvc construction (it snapshots hp)
        fused_bucket_samples=HOP * 32, fused_output_int16=True,
        fused_input_int16=True,
    )
    model_d = GaussianDiffusion(hp)
    params = model_d.init_params(jax.random.PRNGKey(0))
    hub_cfg = hubert_model.HubertConfig()
    hub_params = hubert_model.init(jax.random.PRNGKey(1), hub_cfg)
    voc_cfg = gen.HifiGanConfig(
        num_mels=NMEL, upsample_initial_channel=VOC_CH,
        upsample_rates=(8, 8, 2, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4, 4), resblock="1",
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3, sampling_rate=SR,
        use_nsf=True)
    voc_params = gen.init(jax.random.PRNGKey(2), voc_cfg)

    class VocWrapper:
        params = voc_params
        cfg = voc_cfg

    fused = FusedSvc(hp, params, VocWrapper(), hubert_params=hub_params,
                     hubert_cfg=hub_cfg, speedup=args.acc)
    model = SvcLike(hp, fused)

    durs = [float(x) for x in args.durs.split(",")]
    keys = [int(x) for x in args.keys.split(",")]

    # warmup every bucket the duration mix can hit (+ the stream leg's
    # [context ++ buffer] window), timing each compile — this doubles as
    # the cold-start table for doc/performance.md
    max_d = max(durs) + 0.2  # stream context_ms pushes into the next bucket
    t0 = time.time()
    n_buckets = flask_api.warmup_fused(model, args.acc, max_d)
    warmup_s = time.time() - t0
    log(f"| warmup: {n_buckets} buckets in {warmup_s:.1f}s")

    legs = {}
    legs["nonstream"] = run_leg("nonstream", model, args.acc, durs, keys,
                                minutes, args.concurrency, args.port)
    legs["stream"] = run_leg("stream", model, args.acc, [0.5], keys,
                             minutes, 1, args.port + 1, stream=True)

    summary = {
        "device": str(jax.devices()[0]),
        "dims": "smoke" if args.smoke else "production 44.1k",
        "acc": args.acc, "durs": durs, "keys": keys,
        "warmup_buckets": n_buckets, "warmup_s": round(warmup_s, 1),
        "legs": legs,
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"soak": {k: {kk: v[kk] for kk in
                                   ("requests", "errors",
                                    "recompiles_after_warmup", "overall")}
                              for k, v in legs.items()}}))


if __name__ == "__main__":
    main()
