"""Batch inference driver: slice long audio at silences, convert each chunk,
concatenate (reference ``infer.py``).

Usage:
    python infer.py --project <name> --model checkpoints/<name>/model_ckpt_steps_N.ckpt \
        --config checkpoints/<name>/config.yaml --files song.wav --key 0 --acc 20
"""

import argparse
import io
import os
import time
from pathlib import Path

import numpy as np

from diffsvc_tpu.infer import slicer
from diffsvc_tpu.infer.svc import Svc, get_md5, read_temp, write_temp
from diffsvc_tpu.utils.audio_io import format_wav, load_wav, save_wav

CHUNKS_CACHE = "./infer_tools/new_chunks_temp.json"


def fill_a_to_b(a, b):
    if len(a) < len(b):
        a.extend([a[0]] * (len(b) - len(a)))


def mkdir(paths):
    for p in paths:
        os.makedirs(p, exist_ok=True)


def crossfade_concat(pieces):
    """Overlap-add chunk waveforms with linear crossfades at the seams.

    pieces: list of (audio, ov_left, ov_right) — how far this piece was
    extended into its neighbors. At each seam the overlap is the previous
    piece's RIGHT extension plus this piece's LEFT extension (the pieces
    cover [a-ov_l, b+ov_r] of contiguous [a, b] spans), so both extensions
    must be blended — blending only ov_left would misalign the ramp by
    ov_right and duplicate that much audio at every seam."""
    if not pieces:
        return np.zeros(0, np.float32)
    out = np.asarray(pieces[0][0], np.float32).copy()
    prev_ov_r = pieces[0][2]
    for audio, ov_l, ov_r in pieces[1:]:
        audio = np.asarray(audio, np.float32)
        ov = min(prev_ov_r + ov_l, len(out), len(audio))
        if ov > 0:
            ramp = np.linspace(0.0, 1.0, ov, dtype=np.float32)
            out[-ov:] = out[-ov:] * (1 - ramp) + audio[:ov] * ramp
            out = np.concatenate([out, audio[ov:]])
        else:
            out = np.concatenate([out, audio])
        prev_ov_r = ov_r
    return out


def run_clip(svc_model, key, acc, use_pe, use_crepe, thre, use_gt_mel,
             add_noise_step, project_name="", f_name=None, file_path=None,
             out_path=None, slice_db=-40, audio_format="wav", step=0,
             crossfade_ms: float = 0.0, batch_chunks: bool = False,
             fused: bool = False):
    hp = svc_model.hp
    use_pe = use_pe if hp["audio_sample_rate"] == 24000 else False
    if fused:
        # production serving path: whole pipeline as ONE device program per
        # length bucket (diffsvc_tpu/infer/fused.py).  The fused graph's f0
        # is the in-graph AC tracker (no crepe/pe, like the flask path).
        svc_model.hp.setdefault("fused_bucket_samples",
                                int(hp["hop_size"]) * 256)
        if use_pe or batch_chunks:
            print("| WARNING: --fused ignores use_pe/--batch_chunks")
            use_pe, batch_chunks = False, False
    raw_audio_path = f"./raw/{f_name}" if file_path is None else file_path
    clean_name = Path(raw_audio_path).stem
    wav_path = format_wav(raw_audio_path)

    chunks_dict = read_temp(CHUNKS_CACHE)
    audio, sr = load_wav(wav_path, mono=True)
    wav_hash = get_md5(audio)
    if wav_hash in chunks_dict:
        print("load chunks from temp")
        chunks = chunks_dict[wav_hash]["chunks"]
    else:
        chunks = slicer.cut(wav_path, db_thresh=slice_db)
    chunks_dict[wav_hash] = {"chunks": chunks, "time": int(time.time())}
    write_temp(CHUNKS_CACHE, chunks_dict)
    audio_data, audio_sr = slicer.chunks2audio(wav_path, chunks)

    # crossfade mode: extend each voiced chunk into its neighbors by the
    # overlap and blend the seams (BASELINE config #3 long-audio path)
    ov_in = int(audio_sr * crossfade_ms / 1000)
    if ov_in > 0:
        spans = [tuple(map(int, v["split_time"].split(",")))
                 for v in dict(chunks).values()]
        full_audio, _ = load_wav(wav_path, mono=True)
        audio_data = []
        for (a, b), v in zip(spans, dict(chunks).values()):
            a2 = max(0, a - ov_in)
            b2 = min(len(full_audio), b + ov_in)
            audio_data.append((v["slice"], full_audio[a2:b2], a - a2, b2 - b))
    else:
        audio_data = [(tag, data, 0, 0) for tag, data in audio_data]

    ov_out_scale = hp["audio_sample_rate"] / audio_sr
    expected_total = 0  # output samples excluding crossfade extensions

    # batched mode: run all voiced chunks' diffusion as grouped batches
    batched_results = None
    if batch_chunks:
        bufs, voiced_idx = [], []
        for i, (slice_tag, data, ov_l, ov_r) in enumerate(audio_data):
            if not slice_tag:
                buf = io.BytesIO()
                from scipy.io import wavfile as _wavfile

                _wavfile.write(buf, audio_sr, data.astype(np.float32))
                buf.seek(0)
                bufs.append(buf)
                voiced_idx.append(i)
        res = svc_model.infer_batched(bufs, key=key, acc=acc, use_pe=use_pe,
                                      use_crepe=use_crepe, thre=thre)
        batched_results = dict(zip(voiced_idx, res))

    pieces = []
    f0_tst, f0_pred, out_audio = [], [], []
    for chunk_i, (slice_tag, data, ov_l, ov_r) in enumerate(audio_data):
        print(f"#=====segment start, {round(len(data) / audio_sr, 3)}s======")
        length = int(np.ceil(len(data) / audio_sr * hp["audio_sample_rate"]))
        buf = io.BytesIO()
        from scipy.io import wavfile

        wavfile.write(buf, audio_sr, data.astype(np.float32))
        buf.seek(0)
        if slice_tag:
            print("jump empty segment")
            n_frames = int(np.ceil(length / hp["hop_size"]))
            _f0_tst, _f0_pred, _audio = (np.zeros(n_frames), np.zeros(n_frames),
                                         np.zeros(length))
        elif batched_results is not None:
            _f0_tst, _f0_pred, _audio = batched_results[chunk_i]
        elif fused:
            from diffsvc_tpu.infer.fused import FusedSvc

            tgt_sr = int(hp["audio_sample_rate"])
            w = data.astype(np.float32)
            if int(audio_sr) != tgt_sr:
                from math import gcd

                from scipy.signal import resample_poly

                g = gcd(tgt_sr, int(audio_sr))
                w = resample_poly(w, tgt_sr // g,
                                  int(audio_sr) // g).astype(np.float32)
            wav_o, f0_o, _ = svc_model.infer_fused(
                w, key=key, acc=acc, use_gt_mel=use_gt_mel,
                add_noise_step=add_noise_step)
            _audio = FusedSvc.to_float(wav_o)
            _f0_tst = _f0_pred = np.asarray(f0_o)
        else:
            _f0_tst, _f0_pred, _audio = svc_model.infer(
                buf, key=key, acc=acc, use_pe=use_pe, use_crepe=use_crepe,
                thre=thre, use_gt_mel=use_gt_mel, add_noise_step=add_noise_step)
        # mean-fill length fix (reference infer.py:61-66)
        fix_audio = np.full(length, np.mean(_audio) if len(_audio) else 0.0)
        fix_audio[: len(_audio)] = _audio[0 if len(_audio) < len(fix_audio)
                                          else len(_audio) - len(fix_audio):]
        f0_tst.extend(_f0_tst)
        f0_pred.extend(_f0_pred)
        expected_total += int(np.ceil(
            (len(data) - ov_l - ov_r) / audio_sr * hp["audio_sample_rate"]))
        if ov_in > 0:
            pieces.append((fix_audio, int(round(ov_l * ov_out_scale)),
                           int(round(ov_r * ov_out_scale))))
        else:
            out_audio.extend(list(fix_audio))

    if ov_in > 0:
        # trim the extensions so the output matches the input duration
        out_audio = crossfade_concat(pieces)[:expected_total]

    if audio_format != "wav":
        # save_wav writes RIFF/WAV bytes; renaming the extension would ship
        # WAV payloads as .flac etc. (no flac encoder in this environment)
        print(f"| WARNING: only wav output is supported; writing wav "
              f"(requested {audio_format})")
        audio_format = "wav"
    if out_path is None:
        out_path = (f"./results/{clean_name}_{key}key_{project_name}_"
                    f"{hp['residual_channels']}_{hp['residual_layers']}_"
                    f"{int(step / 1000)}k_{acc}x.{audio_format}")
    save_wav(np.asarray(out_audio), out_path, hp["audio_sample_rate"])
    print(f"| wrote {out_path}")
    return np.array(f0_tst), np.array(f0_pred), out_audio


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description="diffsvc_tpu inference")
    ap.add_argument("--project", required=True)
    ap.add_argument("--model", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--files", nargs="+", required=True,
                    help="wav files under ./raw or absolute paths")
    ap.add_argument("--key", type=int, nargs="+", default=[0])
    # default None = the config's pndm_speedup (so serving profiles like
    # configs/config_44k_fast.yaml actually take effect); the reference's
    # hardcoded default was 20
    ap.add_argument("--acc", type=int, default=None)
    ap.add_argument("--slice_db", type=float, default=-40)
    ap.add_argument("--no_pe", action="store_true")
    ap.add_argument("--no_crepe", action="store_true")
    ap.add_argument("--thre", type=float, default=0.05)
    ap.add_argument("--use_gt_mel", action="store_true")
    ap.add_argument("--add_noise_step", type=int, default=500)
    ap.add_argument("--format", default="wav")
    ap.add_argument("--crossfade_ms", type=float, default=0.0,
                    help="blend chunk seams with linear crossfades")
    ap.add_argument("--batch_chunks", action="store_true",
                    help="run same-length chunks as batched device calls")
    ap.add_argument("--fused", action="store_true",
                    help="use the fused single-dispatch serving graph "
                         "(production path; in-graph AC f0, no crepe/pe)")
    args = ap.parse_args()

    model_path = args.model or f"./checkpoints/{args.project}/"
    config_path = args.config or f"./checkpoints/{args.project}/config.yaml"
    step = 0
    if args.model and "steps_" in args.model:
        step = int(args.model.split("_")[-1].split(".")[0])

    mkdir(["./raw", "./results", "./infer_tools"])
    trans = list(args.key)
    fill_a_to_b(trans, args.files)

    model = Svc(args.project, config_path, True, model_path)
    acc = args.acc if args.acc is not None else int(
        model.hp.get("pndm_speedup", 20) or 20)
    for f_name, tran in zip(args.files, trans):
        file_path = f_name if os.path.isabs(f_name) or os.path.exists(f_name) else None
        run_clip(model, key=tran, acc=acc, use_pe=not args.no_pe,
                 use_crepe=not args.no_crepe, thre=args.thre,
                 use_gt_mel=args.use_gt_mel, add_noise_step=args.add_noise_step,
                 f_name=os.path.basename(f_name), file_path=file_path,
                 project_name=args.project, slice_db=args.slice_db,
                 audio_format=args.format, step=step,
                 crossfade_ms=args.crossfade_ms, batch_chunks=args.batch_chunks,
                 fused=args.fused)
