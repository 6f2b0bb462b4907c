"""Shared per-utterance feature pipeline: file -> processed_input -> batch.

Parity target: reference ``preprocessing/process_pipeline.py`` (File2Batch)
and the mirrored copy in ``infer_tools/infer_tool.py:203-335`` — wav2spec via
the configured vocoder family, f0 (crepe or AC tracker), HuBERT units, the
uniform ``get_align`` stretch, and the pad-to-longest collate.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..config.hparams import HParams
from ..ops.f0_ac import get_pitch_ac
from ..ops.pitch import norm_interp_f0_np


class BinarizationError(Exception):
    pass


def get_align_uniform(mel_len: int, n_units: int) -> np.ndarray:
    """Uniform stretch alignment: each unit frame spans mel_len/n_units mel
    frames; 1-based unit ids, 0 = padding.

    Matches reference ``process_pipeline.py:95-107`` exactly (incl. the
    end_frame+1 overlap-by-one behavior).
    """
    from ..native import runtime as native

    if native.available():
        return native.align_uniform(int(mel_len), int(n_units)).astype(int)
    mel2ph = np.zeros([mel_len], int)
    ph_durs = mel_len / n_units
    start_frame = 0
    for i_ph in range(n_units):
        end_frame = int(i_ph * ph_durs + ph_durs + 0.5)
        mel2ph[start_frame: end_frame + 1] = i_ph + 1
        start_frame = end_frame + 1
    return mel2ph


def get_pitch(wav: np.ndarray, mel: np.ndarray, hp: HParams,
              use_crepe: bool = False, threshold: float = 0.05,
              return_tag: bool = False):
    """f0 + coarse bins on the mel grid. CREPE when requested and weights are
    available, otherwise the in-repo Praat-style AC tracker (the reference's
    parselmouth path).

    When ``f0_cache_dir`` is set, tracks are cached on disk keyed by the
    waveform md5 (the binarizer's equivalent of the inference-side
    ``f0_temp.json`` cache)."""
    def cache_path(tag):
        import hashlib
        import os

        os.makedirs(cache_dir, exist_ok=True)
        md5 = hashlib.new("md5", np.ascontiguousarray(wav)).hexdigest()
        return os.path.join(cache_dir, f"{md5}_{tag}_{len(mel)}.npy")

    def load_cached(tag):
        import os

        fn = cache_path(tag)
        if os.path.exists(fn):
            f0 = np.load(fn)
            from ..ops.pitch import f0_to_coarse

            return f0, f0_to_coarse(f0, hp["f0_bin"], hp["f0_min"],
                                    hp["f0_max"])
        return None

    cache_dir = hp.get("f0_cache_dir", "")
    if cache_dir:
        hit = load_cached("crepe" if use_crepe else "ac")
        if hit is not None:
            return hit

    # `tag` records the tracker ACTUALLY used — a crepe-unavailable
    # fallback must not be cached under the crepe key, or later runs with
    # crepe installed would keep serving AC tracks labeled as crepe
    if use_crepe:
        try:
            from ..ops.crepe import get_pitch_crepe

            f0, coarse = get_pitch_crepe(wav, mel, hp, threshold)
            tag = "crepe"
        except (ImportError, FileNotFoundError) as e:
            print(f"| crepe unavailable ({e}); falling back to AC tracker")
            f0, coarse = get_pitch_ac(wav, len(mel), hp)
            tag = "ac"
    else:
        f0, coarse = get_pitch_ac(wav, len(mel), hp)
        tag = "ac"
    if cache_dir:
        np.save(cache_path(tag), f0)
    if return_tag:
        return f0, coarse, tag
    return f0, coarse


def wav2spec_for(hp: HParams, wav_fn) -> tuple:
    """Dispatch wav2spec through the vocoder registry like the reference.

    Length bucketing (``wav_bucket_frames``, default 128): the waveform is
    zero-padded to a bucket multiple before the jitted mel/f0 stages so XLA
    compiles one program per bucket instead of one per unique clip length;
    the outputs are trimmed back to the true frame count. Set
    ``wav_bucket_frames: 1`` for exact reference frame geometry.
    """
    from ..vocoders.base import VOCODERS, get_vocoder_cls

    name = hp["vocoder"]
    cls = VOCODERS.get(name) or VOCODERS.get(name.split(".")[-1]) or get_vocoder_cls(hp)

    bucket = int(hp.get("wav_bucket_frames", 128) or 1)
    if bucket <= 1:
        return cls.wav2spec(wav_fn, hp=hp)

    from ..utils.audio_io import load_wav, load_wav_nsf

    is_nsf = "nsf" in str(name).lower()
    if isinstance(wav_fn, np.ndarray):
        wav = np.asarray(wav_fn, np.float32)
    elif is_nsf:
        wav, _ = load_wav_nsf(wav_fn, target_sr=hp["audio_sample_rate"])
    else:
        wav, _ = load_wav(wav_fn, sr=hp["audio_sample_rate"])

    hop = hp["hop_size"]
    true_len = len(wav)
    if is_nsf:
        true_frames = 1 + (true_len + 2 * ((hp["fft_size"] - hop) // 2)
                           - hp["fft_size"]) // hop
    else:
        true_frames = 1 + true_len // hop
    pad_len = -(-true_len // (bucket * hop)) * (bucket * hop)
    wav_padded = np.pad(wav, (0, pad_len - true_len))
    wav_out, mel = cls.wav2spec(wav_padded, hp=hp)
    return wav_out[: true_frames * hop] if not is_nsf else wav, mel[:true_frames]


def process_item(item_name: str, wav_fn, hp: HParams, hubert_encode,
                 binarization_args: Optional[dict] = None,
                 use_crepe: Optional[bool] = None, threshold: float = 0.05,
                 spk_id=None, tg_fn=None, ph=None) -> Optional[Dict]:
    """One utterance -> processed_input dict (mel, f0, pitch, hubert, mel2ph).

    Returns None (and prints) on failure, mirroring the binarizer skip-item
    behavior (``base_binarizer.py:169``, "Empty gt f0" guard).

    ``tg_fn``/``ph``: optional MFA TextGrid + phoneme string for
    forced-alignment mel2ph (TTS-style corpora; reference
    ``base_binarizer.py:198-213``, there disabled).  SVC metadata carries
    neither, so the uniform alignment is the production path.
    """
    ba = binarization_args or hp.get("binarization_args", {})
    use_crepe = hp.get("use_crepe", False) if use_crepe is None else use_crepe
    try:
        wav, mel = wav2spec_for(hp, wav_fn)
        processed = {
            "item_name": item_name, "mel": mel, "wav": wav,
            "sec": len(wav) / hp["audio_sample_rate"], "len": mel.shape[0],
            "spk_id": spk_id if spk_id is not None else hp.get("speaker_id", 0),
            "spec_min": np.min(mel, axis=0), "spec_max": np.max(mel, axis=0),
        }
        if ba.get("with_f0", True):
            gt_f0, gt_coarse = get_pitch(wav, mel, hp, use_crepe, threshold)
            if gt_f0.sum() == 0:
                raise BinarizationError("Empty **gt** f0")
            processed["f0"] = gt_f0
            processed["pitch"] = gt_coarse
        if ba.get("with_hubert", True):
            hubert_encoded = processed["hubert"] = hubert_encode(wav_fn)
            if ba.get("with_align", True):
                if tg_fn is not None and ph is not None:
                    from .textgrid import get_mel2ph

                    mel2ph, dur = get_mel2ph(tg_fn, ph, mel.shape[0], hp)
                    processed["mel2ph"], processed["dur"] = mel2ph, dur
                else:
                    processed["mel2ph"] = get_align_uniform(
                        mel.shape[0], hubert_encoded.shape[0])
    except Exception as e:
        print(f"| Skip item ({e}). item_name: {item_name}")
        return None
    return processed


def process_items_batched(metas, hp: HParams, hubert_encode_batch,
                          binarization_args: Optional[dict] = None,
                          use_crepe: Optional[bool] = None,
                          spk_ids=None, group_size: int = 8):
    """Batched variant of :func:`process_item` for offline binarization.

    Items are grouped by waveform bucket; each group runs ONE batched f0
    track (vmapped AC tracker) and ONE batched HuBERT encode, so the number
    of device dispatches scales with bucket count, not item count. Outputs
    are numerically identical to the per-item path (same padded lengths).

    ``hubert_encode_batch(wavs16k [B, L]) -> units [B, T, 256]``.
    Yields (index, processed_input-or-None) pairs in input order.
    """
    import jax
    import jax.numpy as jnp

    from ..ops import f0_ac
    from ..utils.audio_io import load_wav, load_wav_nsf, resample

    ba = binarization_args or hp.get("binarization_args", {})
    use_crepe = hp.get("use_crepe", False) if use_crepe is None else use_crepe
    is_nsf = "nsf" in str(hp.get("vocoder", "")).lower()
    hop = hp["hop_size"]
    bucket = int(hp.get("wav_bucket_frames", 128) or 1) * hop
    sr = hp["audio_sample_rate"]

    # 1) load + bucket
    loaded = []
    for i, (item_name, wav_fn) in enumerate(metas):
        try:
            if is_nsf:
                wav, _ = load_wav_nsf(wav_fn, target_sr=sr)
            else:
                wav, _ = load_wav(wav_fn, sr=sr)
            loaded.append((i, item_name, wav_fn, wav))
        except Exception as e:
            print(f"| Skip item ({e}). item_name: {item_name}")
            yield i, None

    groups: Dict[int, list] = {}
    for rec in loaded:
        pad_len = -(-len(rec[3]) // bucket) * bucket
        groups.setdefault(pad_len, []).append(rec)

    # jitted batched f0 tracker per bucket
    f0_min = float(hp["f0_min"])
    wl_s = f0_ac.PERIODS_PER_WINDOW / f0_min

    for pad_len, recs in groups.items():
        for start in range(0, len(recs), group_size):
            chunk = recs[start: start + group_size]
            wavs = np.stack([np.pad(r[3], (0, pad_len - len(r[3])))
                             for r in chunk])
            # mel per item via the registry path (bucketed jit reuses)
            mels, wavs_out = [], []
            for r in chunk:
                w_out, mel = wav2spec_for(hp, r[3])
                mels.append(mel)
                wavs_out.append(w_out)
            # batched f0 (vmapped single-dispatch tracker)
            win = int(round(wl_s * sr))
            n_frames, t1 = f0_ac._praat_frame_grid(pad_len, sr, hop / sr, wl_s)
            start0 = int(round((t1 - wl_s / 2) * sr))
            fftsz = int(2 ** np.ceil(np.log2(2 * win)))
            track = jax.vmap(lambda w: f0_ac._track.__wrapped__(
                w, sr=sr, hop=hop, n_frames=n_frames, win_samples=win,
                fft_size=fftsz, start0=start0, f0_min=f0_min,
                f0_max=float(hp["f0_max"]), voicing_threshold=0.6,
                tsc=0.01 / (hop / sr)))
            f0_tracks = np.asarray(jax.jit(track)(jnp.asarray(wavs)))
            # batched hubert on 16 kHz resamples
            wav16 = np.stack([resample(w, sr, 16000) for w in wavs])
            units_all = hubert_encode_batch(wav16)

            for j, (i, item_name, wav_fn, wav) in enumerate(chunk):
                try:
                    mel = mels[j]
                    processed = {
                        "item_name": item_name, "wav": wavs_out[j],
                        "mel": mel, "sec": len(wav) / sr, "len": mel.shape[0],
                        "spk_id": (spk_ids[i] if spk_ids is not None
                                   else hp.get("speaker_id", 0)),
                        "spec_min": np.min(mel, axis=0),
                        "spec_max": np.max(mel, axis=0),
                    }
                    if ba.get("with_f0", True):
                        # cut the padded track onto this item's mel grid
                        f0_full = f0_tracks[j]
                        pad_size = (pad_len // hop - len(f0_full) + 1) // 2
                        mel_len = mel.shape[0]
                        f0 = np.zeros(mel_len, np.float32)
                        src0 = max(-pad_size, 0)
                        dst0 = max(pad_size, 0)
                        n = min(len(f0_full) - src0, mel_len - dst0)
                        if n > 0:
                            f0[dst0: dst0 + n] = f0_full[src0: src0 + n]
                        if f0.sum() == 0:
                            raise BinarizationError("Empty **gt** f0")
                        from ..ops.pitch import f0_to_coarse

                        processed["f0"] = f0
                        processed["pitch"] = f0_to_coarse(
                            f0, hp["f0_bin"], f0_min, float(hp["f0_max"]))
                    if ba.get("with_hubert", True):
                        # precomputed sibling .npy units win, like the
                        # per-item Hubertencoder.encode path
                        # (hubertinfer.py:33-35)
                        npy_fn = None
                        if isinstance(wav_fn, (str, os.PathLike)):
                            npy_fn = Path(wav_fn).with_suffix(".npy")
                        if npy_fn is not None and os.path.exists(npy_fn):
                            processed["hubert"] = np.load(str(npy_fn))
                        else:
                            true_units = max(
                                int(len(wav) * 16000 / sr) // 320, 1)
                            processed["hubert"] = np.asarray(
                                units_all[j][:true_units])
                        if ba.get("with_align", True):
                            processed["mel2ph"] = get_align_uniform(
                                mel.shape[0], processed["hubert"].shape[0])
                    yield i, processed
                except Exception as e:
                    print(f"| Skip item ({e}). item_name: {item_name}")
                    yield i, None


def getitem(item: Dict, hp: HParams) -> Dict:
    """processed_input -> training/inference sample (max_frames clip, energy,
    norm_interp f0). Mirrors ``fs2_utils.py:60-106`` / infer_tool getitem."""
    max_frames = hp.get("max_frames", 42000)
    mel = np.asarray(item["mel"], np.float32)[:max_frames]
    energy = np.sqrt((np.exp(mel) ** 2).sum(-1))
    mel2ph = np.asarray(item["mel2ph"], np.int64)[:max_frames] if "mel2ph" in item else None
    f0, uv = norm_interp_f0_np(np.asarray(item["f0"][:max_frames]),
                               pitch_norm=hp.get("pitch_norm", "log"),
                               use_uv=hp.get("use_uv", False),
                               f0_mean=float(hp.get("f0_mean", 0.0) or 0.0),
                               f0_std=float(hp.get("f0_std", 1.0) or 1.0))
    hubert = np.asarray(item["hubert"], np.float32)[: hp.get("max_input_tokens", 60000)]
    pitch = np.asarray(item["pitch"], np.int64)[:max_frames]
    return {
        "id": item.get("id", 0),
        "item_name": item["item_name"],
        "hubert": hubert,
        "mel": mel,
        "pitch": pitch,
        "energy": energy.astype(np.float32),
        "f0": f0.astype(np.float32),
        "uv": uv.astype(np.float32),
        "mel2ph": mel2ph,
        "mel_nonpadding": (np.abs(mel).sum(-1) > 0),
        "spk_id": item.get("spk_id", 0),
    }


def collate_1d(values: List[np.ndarray], pad_value=0.0, max_len=None) -> np.ndarray:
    size = max_len or max(v.shape[0] for v in values)
    res = np.full((len(values), size), pad_value, dtype=values[0].dtype)
    for i, v in enumerate(values):
        res[i, : len(v)] = v
    return res


def collate_2d(values: List[np.ndarray], pad_value=0.0, max_len=None) -> np.ndarray:
    size = max_len or max(v.shape[0] for v in values)
    res = np.full((len(values), size, values[0].shape[1]), pad_value,
                  dtype=values[0].dtype)
    for i, v in enumerate(values):
        res[i, : len(v)] = v
    return res


def processed_input2batch(samples: List[Dict], hp: Optional[HParams] = None,
                          pad_multiple: int = 1) -> Dict:
    """Pad-to-longest collate (reference ``processed_input2batch``).

    ``pad_multiple`` optionally rounds the padded lengths up (bucketing for
    XLA shape reuse; 1 = exact reference behavior).
    """
    if len(samples) == 0:
        return {}

    def _round(n):
        return -(-n // pad_multiple) * pad_multiple

    mel_max = _round(max(s["mel"].shape[0] for s in samples))
    hub_max = _round(max(s["hubert"].shape[0] for s in samples))
    batch = {
        "id": np.array([s["id"] for s in samples], np.int64),
        "item_name": [s["item_name"] for s in samples],
        "nsamples": len(samples),
        "hubert": collate_2d([s["hubert"] for s in samples], 0.0, hub_max),
        "mels": collate_2d([s["mel"] for s in samples], 0.0, mel_max),
        "mel_lengths": np.array([s["mel"].shape[0] for s in samples], np.int64),
        "mel2ph": collate_1d([s["mel2ph"] for s in samples], 0, mel_max)
        if samples[0]["mel2ph"] is not None else None,
        "energy": collate_1d([s["energy"] for s in samples], 0.0, mel_max),
        "pitch": collate_1d([s["pitch"] for s in samples], 0, mel_max),
        "f0": collate_1d([s["f0"] for s in samples], 0.0, mel_max),
        "uv": collate_1d([s["uv"] for s in samples], 0.0, mel_max),
    }
    if hp and hp.get("use_spk_id"):
        batch["spk_ids"] = np.array([s.get("spk_id", 0) for s in samples], np.int64)
    return batch
