"""Svc — the end-to-end inference facade.

Parity target: reference ``infer_tools/infer_tool.py:104-335``:
``Svc(project_name, config_name, hubert_gpu, model_path)`` loads the
diffusion model (converted reference ckpt), HuBERT, the pitch extractor and
the vocoder; ``infer(in_path, key, acc, use_pe, use_crepe, ...)`` runs
feature extraction -> key shift (+key/12 in log2, ceiling zeroing) ->
scan-PLMS sampling -> pe or fs2 f0 -> vocoder, returning
(f0_gt, f0_pred, wav_pred).

TPU notes: the denoise loop + vocoder run as jitted functions; chunk lengths
are bucketed (pad_multiple) so recompilation is bounded. The md5-keyed f0
disk cache (``infer_tools/f0_temp.json``) is kept.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config.hparams import set_hparams
from ..data import features
from ..models import pe as pe_model
from ..models.diffusion import GaussianDiffusion
from ..ops.pitch import denorm_f0
from ..utils import convert_torch as cvt
from ..vocoders.base import get_vocoder_cls
from .hubert_encoder import Hubertencoder

F0_CACHE_PATH = "./infer_tools/f0_temp.json"


def read_temp(file_name: str) -> dict:
    """JSON disk cache with 50 MB / 14-day eviction (infer_tool.py:29-49)."""
    if not os.path.exists(file_name):
        os.makedirs(os.path.dirname(file_name) or ".", exist_ok=True)
        with open(file_name, "w") as f:
            f.write(json.dumps({"info": "temp_dict"}))
        return {}
    try:
        with open(file_name) as f:
            data_dict = json.loads(f.read())
        if os.path.getsize(file_name) > 50 * 1024 * 1024:
            print(f"clean {os.path.basename(file_name)}")
            for wav_hash in list(data_dict.keys()):
                item = data_dict[wav_hash]
                if isinstance(item, dict) and \
                        int(time.time()) - int(item.get("time", 0)) > 14 * 24 * 3600:
                    del data_dict[wav_hash]
    except Exception as e:
        print(e, f"{file_name} error, auto rebuild file")
        data_dict = {"info": "temp_dict"}
    return data_dict


def write_temp(file_name: str, data: dict) -> None:
    with open(file_name, "w") as f:
        f.write(json.dumps(data))


def get_md5(content) -> str:
    return hashlib.new("md5", content).hexdigest()


class Svc:
    def __init__(self, project_name: str, config_name: str, hubert_gpu: bool,
                 model_path: str, pad_multiple: int = 256):
        self.project_name = project_name
        self.model_path = model_path
        self.pad_multiple = pad_multiple  # length bucketing for XLA reuse

        from ..utils.compile_cache import enable as _enable_compile_cache

        _enable_compile_cache()

        self.hp = set_hparams(config=config_name, exp_name=project_name,
                              infer=True, reset=True, hparams_str="",
                              print_hparams=False)
        self.mel_bins = self.hp["audio_num_mel_bins"]

        self.model = GaussianDiffusion(self.hp)
        self.params = cvt.convert_gaussian_diffusion(model_path, self.hp)
        self.hp["hubert_gpu"] = hubert_gpu
        self.hubert = Hubertencoder(self.hp["hubert_path"], hp=self.hp)

        self.pe_params = None
        self.pe_cfg = pe_model.PEConfig.from_hparams(self.hp)
        pe_ckpt = self.hp.get("pe_ckpt", "")
        if pe_ckpt and os.path.exists(pe_ckpt.split("/model_ckpt")[0]):
            try:
                self.pe_params = cvt.convert_pe(pe_ckpt, self.hp)
                print(f"| Loaded pe from {pe_ckpt}")
            except Exception as e:
                print(f"| pe load failed ({e}); use_pe will fall back to fs2 f0")

        self.vocoder = get_vocoder_cls(self.hp)(self.hp)
        self.f0_dict = read_temp(F0_CACHE_PATH)

        # multi-speaker: map speaker names (project_name / speaker_id) to
        # the integer ids the model was trained with (binarizer spk_map)
        self.spk_map = {}
        if self.hp.get("use_spk_id"):
            import json as _json

            smp = os.path.join(str(self.hp.get("binary_data_dir", "")),
                               "spk_map.json")
            if os.path.exists(smp):
                with open(smp, encoding="utf-8") as f:
                    self.spk_map = _json.load(f)

        self._infer_fn = {}
        self._fused = None

    def infer_fused(self, wav: "np.ndarray", key: int = 0, acc: int = 20,
                    seed: int = 0, compute_dtype=None,
                    use_gt_mel: bool = False, add_noise_step: int = 500):
        """Serving fast path: the whole pipeline (mel, AC-f0, hubert, cond,
        diffusion, vocoder) as ONE XLA program per length bucket
        (diffsvc_tpu/infer/fused.py). Key shift is applied on the device f0
        in Hz (2**(key/12) scale with ceiling zeroing, matching infer()).
        ``use_gt_mel``/``add_noise_step`` select the reference's
        shallow-diffusion mode, same semantics as infer()."""
        if self._fused is None or getattr(self._fused, "speedup", None) != int(acc):
            from .fused import FusedSvc

            self._fused = FusedSvc(self.hp, self.params, self.vocoder,
                                   hubert_params=self.hubert.params,
                                   hubert_cfg=self.hubert.cfg,
                                   speedup=int(acc),
                                   compute_dtype=compute_dtype)
        return self._fused(np.asarray(wav, np.float32),
                           jax.random.PRNGKey(seed), key_shift=int(key),
                           spk_id=self.resolve_spk_id(None),
                           use_gt_mel=use_gt_mel,
                           add_noise_step=int(add_noise_step))

    def infer_fused_batched(self, wavs, key: int = 0, acc: int = 20,
                            seed: int = 0, compute_dtype=None):
        """Batched serving fast path: N slicer chunks in ONE vmapped
        dispatch (FusedSvc.batched). At batch 1 the chip is overhead-bound;
        batching chunks of a song recovers the throughput headroom.
        Returns a list of (wav_out, f0, mel) per chunk."""
        if self._fused is None or getattr(self._fused, "speedup", None) != int(acc):
            from .fused import FusedSvc

            self._fused = FusedSvc(self.hp, self.params, self.vocoder,
                                   hubert_params=self.hubert.params,
                                   hubert_cfg=self.hubert.cfg,
                                   speedup=int(acc),
                                   compute_dtype=compute_dtype)
        return self._fused.batched(
            [np.asarray(w, np.float32) for w in wavs],
            rng=jax.random.PRNGKey(seed), key_shifts=int(key),
            spk_id=self.resolve_spk_id(None))

    def _jit_infer(self, speedup: int, use_gt_mel: bool = False,
                   add_noise_step: int = 500):
        key = (speedup, use_gt_mel, add_noise_step)
        if key not in self._infer_fn:
            self._infer_fn[key] = jax.jit(
                lambda p, b, r: self.model.infer(
                    p, b, r, speedup=speedup, use_gt_mel=use_gt_mel,
                    add_noise_step=add_noise_step))
        return self._infer_fn[key]

    # ------------------------------------------------------------------
    def infer(self, in_path, key: int, acc: int, use_pe=True, use_crepe=True,
              thre=0.05, singer=False, seed=0, **kwargs):
        batch = self.pre(in_path, acc, use_crepe, thre,
                         spk_id=kwargs.get("spk_id"))
        # key shift in log2 domain with ceiling zeroing (infer_tool.py:149-150)
        batch["f0"] = batch["f0"] + (key / 12)
        batch["f0"][batch["f0"] > np.log2(self.hp["f0_max"])] = 0

        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray) and k in
                  ("hubert", "mels", "mel2ph", "energy", "f0", "uv")}
        if self.hp.get("use_spk_id") and "spk_ids" in batch:
            jbatch["spk_embed"] = jnp.asarray(batch["spk_ids"])

        t0 = time.time()
        outputs = self._jit_infer(
            int(acc), bool(kwargs.get("use_gt_mel", False)),
            int(kwargs.get("add_noise_step", 500)))(
            self.params, jbatch, jax.random.PRNGKey(seed))
        mel_out = np.asarray(outputs["mel_out"])
        print(f"executing 'diff_infer' costed {time.time() - t0:.3f}s")

        batch["outputs"] = mel_out
        batch["mel2ph_pred"] = np.asarray(outputs["mel2ph"])
        batch["f0_gt"] = np.asarray(denorm_f0(
            batch["f0"], batch["uv"], pitch_norm=self.hp.get("pitch_norm", "log"),
            use_uv=self.hp.get("use_uv", False),
            f0_mean=float(self.hp.get("f0_mean", 0.0) or 0.0),
            f0_std=float(self.hp.get("f0_std", 1.0) or 1.0)))
        if use_pe and self.pe_params is not None:
            pe_out = pe_model.apply(self.pe_params, self.pe_cfg,
                                    jnp.asarray(mel_out))
            batch["f0_pred"] = np.asarray(pe_out["f0_denorm_pred"])
        else:
            batch["f0_pred"] = np.asarray(outputs["f0_denorm"])
        return self.after_infer(batch, singer, in_path)

    def infer_batched(self, inputs, key: int, acc: int, use_pe=True,
                      use_crepe=True, thre=0.05, seed=0):
        """Convert MANY clips/chunks with batched device work.

        Feature extraction runs per clip (cached/bucketed); clips are then
        grouped by padded mel length and each group runs ONE diffusion
        sampling and ONE batched vocoder call — for sliced long audio this
        collapses dozens of device dispatches into a few. Returns a list of
        (f0_gt, f0_pred, wav_pred) in input order.

        Not in the reference (it loops chunks one by one); outputs per chunk
        match ``infer()`` up to the shared-batch RNG draw.
        """
        samples = []
        for in_path in inputs:
            batch1 = self.pre(in_path, acc, use_crepe, thre)
            batch1["f0"] = batch1["f0"] + (key / 12)
            batch1["f0"][batch1["f0"] > np.log2(self.hp["f0_max"])] = 0
            samples.append(batch1)

        # group indices by (mel_len_padded, hubert_len_padded)
        groups = {}
        for i, b in enumerate(samples):
            k = (b["mels"].shape[1], b["hubert"].shape[1])
            groups.setdefault(k, []).append(i)

        results = [None] * len(samples)
        use_pe_eff = use_pe and self.pe_params is not None
        for (t_mel, t_ph), idxs in groups.items():
            stack = {k: np.concatenate([samples[i][k] for i in idxs], axis=0)
                     for k in ("hubert", "mels", "mel2ph", "energy", "f0", "uv")}
            jbatch = {k: jnp.asarray(v) for k, v in stack.items()}
            if self.hp.get("use_spk_id") and "spk_ids" in samples[idxs[0]]:
                jbatch["spk_embed"] = jnp.asarray(np.concatenate(
                    [samples[i]["spk_ids"] for i in idxs]))
            outputs = self._jit_infer(int(acc))(
                self.params, jbatch, jax.random.PRNGKey(seed))
            mel_out = np.asarray(outputs["mel_out"])
            if use_pe_eff:
                f0_pred_all = np.asarray(pe_model.apply(
                    self.pe_params, self.pe_cfg,
                    outputs["mel_out"])["f0_denorm_pred"])
            else:
                f0_pred_all = np.asarray(outputs["f0_denorm"])
            f0_gt_all = np.asarray(denorm_f0(
                stack["f0"], stack["uv"],
                pitch_norm=self.hp.get("pitch_norm", "log"),
                use_uv=self.hp.get("use_uv", False),
                f0_mean=float(self.hp.get("f0_mean", 0.0) or 0.0),
                f0_std=float(self.hp.get("f0_std", 1.0) or 1.0)))
            # batched vocoding when the wrapper exposes raw generator state
            wavs = None
            if hasattr(self.vocoder, "params") and hasattr(self.vocoder, "cfg"):
                from ..ops.mel import LN_10
                from ..vocoders import generator as gen

                is_nsf = "nsf" in str(self.hp.get("vocoder", "")).lower()
                mel_clip = np.clip(mel_out, self.hp["mel_vmin"],
                                   self.hp["mel_vmax"])
                # collate-padding frames are exact-0 mel (mel2ph mask); as
                # log-mel, 0 means ~unit amplitude — loud broadband energy
                # that bleeds back into the kept tail through the
                # generator's receptive field. Floor them to the silence
                # level before vocoding.
                pad_mask = np.abs(mel_out).sum(-1) <= 0
                mel_clip = np.where(pad_mask[:, :, None],
                                    np.float32(self.hp["mel_vmin"]), mel_clip)
                voc_in = jnp.asarray(mel_clip * (LN_10 if is_nsf else 1.0))
                f0_voc = jnp.asarray(f0_pred_all) \
                    if self.hp.get("use_nsf") else None
                lanes = getattr(self.vocoder, "pack_lanes", 0)
                if lanes:  # channel-packed MXU path (ops/packed_conv.py)
                    wavs = np.asarray(gen.apply_packed(
                        self.vocoder.run_params, self.vocoder.cfg, voc_in,
                        f0_voc, jax.random.PRNGKey(seed), lane_target=lanes))
                else:
                    wavs = np.asarray(gen.apply(
                        self.vocoder.params, self.vocoder.cfg, voc_in, f0_voc,
                        jax.random.PRNGKey(seed)))

            hop_up = None
            for j, i in enumerate(idxs):
                mask = np.abs(mel_out[j]).sum(-1) > 0
                if wavs is not None:
                    if hop_up is None:
                        hop_up = wavs.shape[1] // mel_out.shape[1]
                    # keep only the real frames' audio (padding tail masked)
                    n_real = int(mask.sum())
                    # real frames are a prefix (padding is trailing)
                    wav_pred = wavs[j][: n_real * hop_up]
                    f0_gt = f0_gt_all[j][: len(mask)][mask]
                    f0_pred = f0_pred_all[j][: len(mask)][mask]
                    results[i] = (f0_gt, f0_pred, wav_pred)
                else:
                    pred = {"mels": stack["mels"][j], "outputs": mel_out[j],
                            "f0_gt": f0_gt_all[j], "f0_pred": f0_pred_all[j]}
                    results[i] = self.after_infer(pred)
        return results

    def after_infer(self, prediction, singer=False, in_path=""):
        """Unpad by nonzero-mel mask, clip, vocode (infer_tool.py:171-201)."""
        mel_gt = prediction["mels"][0] if prediction["mels"].ndim == 3 else prediction["mels"]
        mel_gt_mask = np.abs(mel_gt).sum(-1) > 0

        mel_pred = prediction["outputs"][0] if prediction["outputs"].ndim == 3 else prediction["outputs"]
        mel_pred_mask = np.abs(mel_pred).sum(-1) > 0
        mel_pred = mel_pred[mel_pred_mask]
        mel_pred = np.clip(mel_pred, self.hp["mel_vmin"], self.hp["mel_vmax"])

        f0_gt = prediction.get("f0_gt")
        if f0_gt is not None:
            f0_gt = (f0_gt[0] if f0_gt.ndim == 2 else f0_gt)[mel_gt_mask]
        f0_pred = prediction.get("f0_pred")
        f0_pred = f0_pred[0] if f0_pred.ndim == 2 else f0_pred
        if len(f0_pred) > len(mel_pred_mask):
            f0_pred = f0_pred[: len(mel_pred_mask)]
        f0_pred = f0_pred[mel_pred_mask]

        if singer:
            data_path = str(in_path).replace("batch", "singer_data")
            np.save(data_path[:-4] + "_mel.npy", mel_pred)
            np.save(data_path[:-4] + "_f0.npy", f0_pred)
        t0 = time.time()
        wav_pred = self.vocoder.spec2wav(mel_pred, f0=f0_pred)
        print(f"executing 'after_infer' costed {time.time() - t0:.3f}s")
        return f0_gt, f0_pred, wav_pred

    # ------------------------------------------------------------------
    def temporary_dict2processed_input(self, item_name, temp_dict,
                                       use_crepe=True, thre=0.05):
        hp = self.hp

        def cached_get_pitch(wav, mel):
            if use_crepe:
                md5 = get_md5(wav)
                if f"{md5}_gt" in self.f0_dict:
                    print("load temp crepe f0")
                    gt = np.array(self.f0_dict[f"{md5}_gt"]["f0"])
                    coarse = np.array(self.f0_dict[f"{md5}_coarse"]["f0"])
                    return gt, coarse
                gt, coarse, tag = features.get_pitch(wav, mel, hp, True, thre,
                                                     return_tag=True)
                if tag == "crepe":
                    # only genuine crepe tracks go into the crepe cache — a
                    # weights-unavailable AC fallback must not masquerade as
                    # crepe on later (crepe-capable) runs
                    now = int(time.time())
                    self.f0_dict[f"{md5}_gt"] = {"f0": gt.tolist(), "time": now}
                    self.f0_dict[f"{md5}_coarse"] = {
                        "f0": np.asarray(coarse).tolist(), "time": now}
                    write_temp(F0_CACHE_PATH, self.f0_dict)
                return gt, coarse
            return features.get_pitch(wav, mel, hp, False, thre)

        wav, mel = features.wav2spec_for(hp, temp_dict["wav_fn"])
        processed = {"item_name": item_name, "mel": mel,
                     "sec": len(wav) / hp["audio_sample_rate"],
                     "len": mel.shape[0], **temp_dict}
        ba = hp.get("binarization_args", {})
        if ba.get("with_f0", True):
            t0 = time.time()
            processed["f0"], processed["pitch"] = cached_get_pitch(wav, mel)
            print(f"executing 'get_pitch' costed {time.time() - t0:.3f}s")
        if ba.get("with_hubert", True):
            t0 = time.time()
            processed["hubert"] = self.hubert.encode(temp_dict["wav_fn"])
            print(f"hubert time used {time.time() - t0:.3f}")
            if ba.get("with_align", True):
                processed["mel2ph"] = features.get_align_uniform(
                    mel.shape[0], processed["hubert"].shape[0])
        return processed

    def resolve_spk_id(self, spk_id=None) -> int:
        """Explicit int wins; else project_name / speaker_id through the
        binarizer's spk_map; else 0."""
        if spk_id is not None and not isinstance(spk_id, str):
            return int(spk_id)
        for name in (spk_id, self.project_name,
                     self.hp.get("speaker_id")):
            if name is None:
                continue
            if isinstance(name, str) and name in self.spk_map:
                return int(self.spk_map[name])
            if not isinstance(name, str):
                return int(name)
        return 0

    def pre(self, wav_fn, accelerate, use_crepe=True, thre=0.05, spk_id=None):
        if isinstance(wav_fn, io.BytesIO):
            item_name = self.project_name
        else:
            item_name = os.path.splitext(os.path.basename(str(wav_fn)))[0]
        temp_dict = {"wav_fn": wav_fn, "spk_id": self.resolve_spk_id(spk_id)}
        processed = self.temporary_dict2processed_input(
            item_name, temp_dict, use_crepe, thre)
        self.hp["pndm_speedup"] = accelerate
        sample = features.getitem(processed, self.hp)
        return features.processed_input2batch(
            [sample], self.hp, pad_multiple=self.pad_multiple)
