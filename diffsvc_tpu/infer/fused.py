"""Fully-fused single-dispatch inference graph.

The modular path (Svc) runs mel / f0 / hubert / condition / diffusion /
vocoder as separate jitted calls — each one a host->device round trip. For
serving, this module compiles the ENTIRE post-slicing pipeline into ONE
XLA program per length bucket:

    (wav_44k, rng) -> (wav_out, f0, mel)

On-device re-implementations of the host glue:
- the 44.1k->16k HuBERT resample as a polyphase gather+dot (ops/resample),
- uniform mel2ph alignment as a searchsorted (no Python loop),
- norm_interp_f0 as forward/backward-fill linear interpolation,
- the AC pitch tracker's mel-grid padding with static sizes.

Everything inherits static shapes from the length bucket, so XLA fuses
feature extraction into the diffusion prologue and the vocoder epilogue.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import hubert as hubert_model
from ..ops import f0_ac, mel as mel_ops
from ..ops.pitch import norm_f0


def align_uniform_device(mel_len: int, n_units: int):
    """Vectorized get_align (reference process_pipeline.py:95-107):
    frame f -> unit j+1 where j is the first unit whose span covers f."""
    i = jnp.arange(n_units, dtype=jnp.float32)
    ph_durs = mel_len / n_units
    end_frame = jnp.floor(i * ph_durs + ph_durs + 0.5).astype(jnp.int32)
    f = jnp.arange(mel_len, dtype=jnp.int32)
    # unit i covers frames [end_frame[i-1]+1 .. end_frame[i]], so frame f
    # belongs to the smallest j with end_frame[j] >= f
    j = jnp.searchsorted(end_frame, f, side="left")
    return jnp.clip(j + 1, 1, n_units)


def norm_interp_f0_device(f0, pitch_norm: str = "log",
                          f0_mean: float = 0.0, f0_std: float = 1.0):
    """Device norm_interp_f0: log2 + linear interpolation over unvoiced.

    Returns (f0_interp, uv) float32; all-unvoiced input -> zeros.
    """
    n = f0.shape[0]
    uv = f0 == 0
    voiced = ~uv
    lf0 = jnp.where(voiced, norm_f0(jnp.where(voiced, f0, 1.0),
                                    pitch_norm=pitch_norm,
                                    f0_mean=f0_mean, f0_std=f0_std), 0.0)
    idx = jnp.arange(n)
    # previous voiced index (or -1), next voiced index (or n)
    prev_idx = jax.lax.associative_scan(jnp.maximum,
                                        jnp.where(voiced, idx, -1))
    next_rev = jax.lax.associative_scan(
        jnp.maximum, jnp.where(voiced[::-1], idx, -1))[::-1]
    next_idx = n - 1 - next_rev
    has_prev = prev_idx >= 0
    has_next = next_idx <= n - 1

    pv = lf0[jnp.clip(prev_idx, 0, n - 1)]
    nv = lf0[jnp.clip(next_idx, 0, n - 1)]
    span = jnp.maximum((next_idx - prev_idx).astype(jnp.float32), 1.0)
    w = (idx - prev_idx).astype(jnp.float32) / span
    interp = pv * (1 - w) + nv * w
    interp = jnp.where(has_prev & has_next, interp,
                       jnp.where(has_prev, pv, nv))
    out = jnp.where(voiced, lf0, interp)
    any_voiced = voiced.any()
    out = jnp.where(any_voiced, out, jnp.zeros_like(out))
    return out.astype(jnp.float32), uv.astype(jnp.float32)


class FusedSvc:
    """Builds and caches per-length fused inference programs."""

    @staticmethod
    def to_float(wav):
        """Decode a fused output waveform: int16 (fused_output_int16 mode)
        -> float32 in [-1, 1]; float passes through.  Host-side numpy."""
        w = np.asarray(wav)
        if w.dtype == np.int16:
            return w.astype(np.float32) / 32767.0
        return w

    @staticmethod
    def to_int16(wav):
        """Encode a float waveform to the int16 wire format
        (fused_input_int16 mode); int16 passes through.  Inverse of
        :meth:`to_float` on the int16 grid.  Host-side numpy."""
        w = np.asarray(wav)
        if w.dtype == np.int16:
            return w
        return np.round(np.clip(w, -1.0, 1.0) * 32767.0).astype(np.int16)

    def __init__(self, hp, params, vocoder, hubert_params=None,
                 hubert_cfg=None, speedup: int = 20,
                 compute_dtype: Optional[str] = None):
        from ..models.diffusion import GaussianDiffusion

        # snapshot hp: a FusedSvc traces lazily, so sharing the caller's
        # dict by reference would let a later mutation (another FusedSvc's
        # compute_dtype override, a modular Svc flag flip) silently change
        # what THIS instance compiles
        self.hp = type(hp)(hp)
        if compute_dtype:
            self.hp["diff_compute_dtype"] = compute_dtype
        self.model = GaussianDiffusion(self.hp)
        self.params = params
        self.vocoder = vocoder  # wrapper with .params/.cfg
        self.hub_params = hubert_params
        self.hub_cfg = hubert_cfg or hubert_model.HubertConfig()
        self.speedup = int(speedup)
        self._fns = {}

    # ------------------------------------------------------------------
    def _build(self, n44: int, model=None, use_voc_tail: bool = True,
               use_gt_mel: bool = False, add_noise_step: int = 500):
        from ..ops.resample import resample_length, resample_poly_device

        n16 = resample_length(n44, self.hp["audio_sample_rate"], 16000)
        hp = self.hp
        sr = hp["audio_sample_rate"]
        hop = hp["hop_size"]
        nfft = hp["fft_size"]
        nmel = hp["audio_num_mel_bins"]
        voc_name = str(hp.get("vocoder", "")).lower()
        is_nsf = "nsf" in voc_name
        # the iSTFT head trains on the NSF wav2spec (istft_head.wav2spec
        # delegates to NsfHifiGAN's), so it shares the NSF mel geometry
        # but consumes log10-mel directly (no ln conversion)
        is_istft = "istft" in voc_name
        nsf_mel = is_nsf or is_istft
        model = model if model is not None else self.model
        voc = self.vocoder
        speedup = self.speedup

        # static geometry
        if nsf_mel:
            t_mel = 1 + (n44 + 2 * ((nfft - hop) // 2) - nfft) // hop
        else:
            t_mel = 1 + n44 // hop
        pad_t = -(-t_mel // 128) * 128
        n_units = max((n16 + 2 * 40) // 320, 1)

        # AC tracker static grid
        f0_min = float(hp["f0_min"])
        wl_s = f0_ac.PERIODS_PER_WINDOW / f0_min
        win_samples = int(round(wl_s * sr))
        n_frames, t1 = f0_ac._praat_frame_grid(n44, sr, hop / sr, wl_s)
        start0 = int(round((t1 - wl_s / 2) * sr))
        fftsz = int(2 ** np.ceil(np.log2(2 * win_samples)))
        pad_size = (n44 // hop - n_frames + 1) // 2

        # params enter as ARGUMENTS (not closure constants) so the compiled
        # HLO stays small and weights live on-device between calls
        def fused(diff_params, hub_params, voc_params, wav44, rng,
                  key_shift, spk):
            # int16 INPUT wire (fused_input_int16 / an int16 caller array):
            # the host->device copy of the input waveform is as large as
            # the output fetch fused_output_int16 already halved — and the
            # serving sources (VST buffers, HTTP wav posts, even the
            # reference's own modular path, which round-trips through an
            # int16 wav in memory) are PCM16 to begin with, so decoding on
            # device loses nothing. Dtype is static under jit: a float
            # caller compiles the exact old graph.
            if wav44.dtype == jnp.int16:
                wav44 = wav44.astype(jnp.float32) * (1.0 / 32767.0)
            # --- 44.1k -> 16k resample for HuBERT, in-graph (polyphase
            # gather+dot; removes the last host-side DSP stage) ---
            wav16 = resample_poly_device(wav44, sr, 16000)

            # --- mel ---
            dft_prec = str(hp.get("mel_dft_precision", "highest"))
            if nsf_mel:
                mel = mel_ops.wav2mel_nsf(
                    wav44, sr=sr, n_fft=nfft, hop=hop, win_length=hp["win_size"],
                    n_mels=nmel, fmin=float(hp["fmin"]), fmax=float(hp["fmax"]),
                    dft_precision=dft_prec)
            else:
                mel = mel_ops.wav2mel_pwg(
                    wav44, sr=sr, n_fft=nfft, hop=hop, win_length=hp["win_size"],
                    n_mels=nmel, fmin=float(hp["fmin"]), fmax=float(hp["fmax"]),
                    eps=float(hp.get("wav2spec_eps", 1e-6)),
                    dft_precision=dft_prec)
            mel = mel[:t_mel]

            # --- f0 (AC tracker) on the mel grid ---
            f0_track = f0_ac._track.__wrapped__(
                wav44, sr=sr, hop=hop, n_frames=n_frames,
                win_samples=win_samples, fft_size=fftsz, start0=start0,
                f0_min=f0_min, f0_max=float(hp["f0_max"]),
                voicing_threshold=0.6, tsc=0.01 / (hop / sr))
            f0_grid = jnp.zeros((t_mel,), jnp.float32)
            src_start = max(-pad_size, 0)
            dst_start = max(pad_size, 0)
            copy_n = min(n_frames - src_start, t_mel - dst_start)
            f0_grid = jax.lax.dynamic_update_slice(
                f0_grid, jax.lax.dynamic_slice(
                    f0_track, (src_start,), (copy_n,)), (dst_start,))

            # --- hubert units ---
            if str(hp.get("hubert_compute_dtype", "")) in ("bf16", "bfloat16"):
                hub_p = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, hub_params)
                units = hubert_model.units.__wrapped__(
                    hub_p, self.hub_cfg, wav16[None].astype(jnp.bfloat16)
                )[0].astype(jnp.float32)
            else:
                units = hubert_model.units.__wrapped__(
                    hub_params, self.hub_cfg, wav16[None])[0]

            # --- condition assembly (padded to the bucket) ---
            mel2ph = jnp.zeros((pad_t,), jnp.int32)
            mel2ph = mel2ph.at[:t_mel].set(
                align_uniform_device(t_mel, units.shape[0]))
            f0n, uv = norm_interp_f0_device(
                f0_grid, hp.get("pitch_norm", "log"),
                f0_mean=float(hp.get("f0_mean", 0.0) or 0.0),
                f0_std=float(hp.get("f0_std", 1.0) or 1.0))
            # key transpose in the log2 domain with ceiling zeroing
            # (reference infer_tool.py:149-150)
            f0n = f0n + key_shift / 12.0
            f0n = jnp.where(f0n > np.log2(float(hp["f0_max"])), 0.0, f0n)
            f0b = jnp.zeros((pad_t,), jnp.float32).at[:t_mel].set(f0n)
            uvb = jnp.zeros((pad_t,), jnp.float32).at[:t_mel].set(uv)
            melb = jnp.zeros((pad_t, nmel), jnp.float32).at[:t_mel].set(mel)
            energy = jnp.sqrt((jnp.exp(melb) ** 2).sum(-1))
            # padding frames are log-mel 0 -> energy sqrt(n_mels) (coarse
            # bin 255); the modular path pads energy with 0 (bin 0) — mask
            # so the denoiser's receptive field doesn't see max-energy pads
            energy = energy * (jnp.arange(pad_t) < t_mel)
            batch = {"hubert": units[None], "mel2ph": mel2ph[None],
                     "f0": f0b[None], "uv": uvb[None], "energy": energy[None],
                     "mels": melb[None]}
            if hp.get("use_spk_id"):
                batch["spk_embed"] = spk[None]

            # --- diffusion ---
            # use_gt_mel = the reference's shallow-diffusion mode (infer.py
            # run_clip kwargs -> diffusion.py:270-276): start from the
            # INPUT's mel q_sampled to add_noise_step-1 instead of pure
            # noise, keeping the source timbre envelope.  Static per graph:
            # the ladder length changes with t_start.
            out = model.infer(diff_params, batch, rng, speedup=speedup,
                              use_gt_mel=use_gt_mel,
                              add_noise_step=add_noise_step)
            mel_pred = out["mel_out"][:, :t_mel, :]
            mel_pred = jnp.clip(mel_pred, hp.get("mel_vmin", -6.0),
                                hp.get("mel_vmax", 1.5))

            # --- vocoder ---
            from ..vocoders import generator as gen

            voc_in = mel_pred * (mel_ops.LN_10 if is_nsf else 1.0)
            # vocoder f0 = the conditioner's (key-shifted) denormalized f0,
            # matching the reference's use_pe=False path
            f0_voc = out["f0_denorm"][:, :t_mel]
            dtype = jnp.bfloat16 if str(hp.get("voc_compute_dtype", "")) in (
                "bf16", "bfloat16") else None
            lanes = getattr(voc, "pack_lanes", 0)
            tail_plan = getattr(voc, "tail_plan", None) if use_voc_tail \
                else None
            if is_istft:  # iSTFT-head family (vocoders/istft_head.py)
                from ..vocoders import istft_head as ih

                wav_out = ih.apply(
                    voc_params, voc.cfg, voc_in,
                    f0_voc if voc.cfg.use_f0 else None, dtype=dtype)
            elif tail_plan is not None:  # fused Pallas tail (vocoder_tail.py)
                wav_out = gen.apply_tail(
                    voc_params, voc.cfg, voc_in, f0_voc,
                    jax.random.fold_in(rng, 7), plan=tail_plan)
            elif lanes:  # channel-packed MXU path (ops/packed_conv.py)
                # the wrapper's run_params may be the tail-params dict
                # (plain/packed/wcat/bcat) when the Pallas tail is set up
                # but disabled here (e.g. the vmapped batched graph)
                pp = voc_params["packed"] if "wcat" in voc_params \
                    else voc_params
                wav_out = gen.apply_packed(
                    pp, voc.cfg, voc_in, f0_voc,
                    jax.random.fold_in(rng, 7), dtype=dtype,
                    lane_target=lanes)
            else:
                wav_out = gen.apply(voc_params, voc.cfg, voc_in, f0_voc,
                                    jax.random.fold_in(rng, 7), dtype=dtype)
            wav1 = wav_out[0]
            if bool(hp.get("fused_output_int16", False)):
                # serve the wire format: every consumer (save_wav, the
                # flask/VST response) quantizes to int16 anyway, and the
                # single big device->host copy halves (measured 23.8 ms
                # for the f32 waveform over the bench tunnel).  Decode
                # with FusedSvc.to_float.
                wav1 = jnp.round(jnp.clip(wav1, -1.0, 1.0) * 32767.0
                                 ).astype(jnp.int16)
            return wav1, f0_voc[0], mel_pred[0]

        return fused

    def _voc_run_params(self):
        voc = self.vocoder
        if getattr(voc, "pack_lanes", 0):
            if not hasattr(voc, "run_params"):
                raise AttributeError(
                    "vocoder wrapper sets pack_lanes but has no run_params; "
                    "build them with generator.pack_params(params, cfg, "
                    "pack_lanes) or use generator.setup_serving")
            return voc.run_params
        return voc.params

    def _get_fn(self, n44: int, use_gt_mel: bool = False,
                add_noise_step: int = 500):
        key = n44 if not use_gt_mel else ("gt_mel", n44, add_noise_step)
        if key not in self._fns:
            self._fns[key] = jax.jit(self._build(
                n44, use_gt_mel=use_gt_mel, add_noise_step=add_noise_step))
        return self._fns[key]

    def _get_batched_fn(self, n44: int):
        """vmap of the whole fused graph over chunks: one dispatch converts
        N equal-bucket chunks. At batch 1 the chip is latency/overhead
        bound (MFU ~3%); batching chunks from the slicer recovers the
        throughput headroom without touching the graph."""
        key = ("batched", n44)
        if key not in self._fns:
            # the Pallas residual-stack kernel vmaps correctly (the
            # sample axis becomes a leading grid dimension; parity tested
            # in tests/test_diffnet_stack.py), so the batched graph keeps
            # it.  The Pallas vocoder TAIL stays off here: its manual DMA
            # windows over an ANY-space ref do not lift under vmap.  The
            # whole-ladder sampler kernel is also off: its VMEM scratch
            # carries sampler state across sequential grid steps, which a
            # lifted batch grid dimension would interleave (and the B==1
            # gate cannot see the vmap from inside the per-sample trace).
            from ..models.diffusion import GaussianDiffusion

            hp_b = dict(self.hp)
            hp_b["sampler_pallas_ladder"] = "off"
            fused = self._build(n44, model=GaussianDiffusion(hp_b),
                                use_voc_tail=False)
            self._fns[key] = jax.jit(jax.vmap(
                fused, in_axes=(None, None, None, 0, 0, 0, None)))
        return self._fns[key]

    def __call__(self, wav44: np.ndarray, rng=None, key_shift: int = 0,
                 spk_id: int = 0, use_gt_mel: bool = False,
                 add_noise_step: int = 500):
        hp = self.hp
        bucket = int(hp.get("fused_bucket_samples", 0))
        wav44 = np.asarray(wav44)
        if wav44.dtype != np.int16:
            wav44 = wav44.astype(np.float32, copy=False)
            if bool(hp.get("fused_input_int16", False)):
                wav44 = self.to_int16(wav44)
        true_n44 = len(wav44)
        n44 = true_n44
        if bucket:
            n44 = -(-n44 // bucket) * bucket
            wav44 = np.pad(wav44, (0, n44 - len(wav44)))
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        wav_o, f0_o, mel_o = self._get_fn(
            n44, use_gt_mel=use_gt_mel, add_noise_step=add_noise_step)(
            self.params, self.hub_params, self._voc_run_params(),
            jnp.asarray(wav44), rng,
            jnp.float32(key_shift), jnp.int32(spk_id))
        if n44 != true_n44:
            # trim the vocoded bucket padding back to the true input length
            hop = int(hp["hop_size"])
            t_true = -(-true_n44 // hop)
            wav_o = wav_o[: min(true_n44, wav_o.shape[0])]
            f0_o = f0_o[:t_true]
            mel_o = mel_o[:t_true]
        return wav_o, f0_o, mel_o

    def batched(self, wavs, rng=None, key_shifts=None, spk_id: int = 0):
        """Convert N chunks in ONE dispatch (vmapped fused graph).

        All chunks are padded to the longest (rounded up to
        ``fused_bucket_samples`` when set, bounding recompiles). Returns a
        list of (wav_out, f0, mel) trimmed to each chunk's true length.
        ``key_shifts`` may be a scalar or a per-chunk sequence.
        """
        hp = self.hp
        n = len(wavs)
        assert n >= 1
        lens = [len(w) for w in wavs]
        n44 = max(lens)
        bucket = int(hp.get("fused_bucket_samples", 0))
        if bucket:
            n44 = -(-n44 // bucket) * bucket
        # the int16 wire engages only via the hp flag OR when EVERY input
        # already is int16 — never silently quantize float32 members of a
        # mixed batch to the int16 grid (they upcast via to_float instead)
        int16_wire = (bool(hp.get("fused_input_int16", False))
                      or all(np.asarray(w).dtype == np.int16 for w in wavs))
        stacked = np.zeros((n, n44), np.int16 if int16_wire else np.float32)
        for i, w in enumerate(wavs):
            stacked[i, : len(w)] = self.to_int16(w) if int16_wire \
                else self.to_float(w)
        if key_shifts is None:
            key_shifts = 0
        if np.ndim(key_shifts) == 0:
            key_shifts = [key_shifts] * n
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rngs = jax.random.split(rng, n)
        wav_o, f0_o, mel_o = self._get_batched_fn(n44)(
            self.params, self.hub_params, self._voc_run_params(),
            jnp.asarray(stacked), rngs,
            jnp.asarray(np.asarray(key_shifts, np.float32)),
            jnp.int32(spk_id))
        hop = int(hp["hop_size"])
        out = []
        for i, ln in enumerate(lens):
            t_true = -(-ln // hop)
            out.append((wav_o[i, : min(ln, wav_o.shape[1])],
                        f0_o[i, :t_true], mel_o[i, :t_true]))
        return out

    # ------------------------------------------------------------------
    # multi-chip serving: the batched graph sharded over a device mesh
    # ------------------------------------------------------------------
    def _get_sharded_batched_fn(self, n44: int, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..models.diffusion import GaussianDiffusion

        key = ("sharded", n44, tuple(mesh.shape.items()),
               tuple(d.id for d in mesh.devices.flat))
        if key not in self._fns:
            hp_b = dict(self.hp)
            hp_b["diffnet_pallas"] = "off"   # not vmap/shard-safe
            hp_b["sampler_pallas_ladder"] = "off"  # sequential-grid scratch
            fused = self._build(n44, model=GaussianDiffusion(hp_b),
                                use_voc_tail=False)
            vm = jax.vmap(fused, in_axes=(None, None, None, 0, 0, 0, None))
            rep = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            self._fns[key] = jax.jit(
                vm,
                in_shardings=(rep, rep, rep, data, data, data, rep),
                out_shardings=(data, data, data))
        return self._fns[key]

    def batched_sharded(self, wavs, mesh, rng=None, key_shifts=None,
                        spk_id: int = 0):
        """Data-sharded batched serving: N chunks split across the mesh's
        ``data`` axis, ONE SPMD dispatch (params replicated, chunk batch
        sharded — serving scales across chips exactly like training does).

        N is padded to a multiple of the data-axis size with silent dummy
        chunks whose results are dropped.  Per-chunk numerics are identical
        to :meth:`batched` (no cross-chunk math, so SPMD partitioning
        changes nothing); verified in tests/test_fused_sharded.py.

        Per-chip throughput math: one v5e chip sustains batched RTF r_b
        (BASELINE.md); D chips at data-parallel batch N process N chunks in
        the same wall time a single chip needs for N/D — aggregate
        throughput scales as D / r_b chunk-seconds per second, with zero
        inter-chip traffic after the (replicated) weights load.
        """
        dp = int(mesh.shape["data"])
        n_true = len(wavs)
        n = -(-n_true // dp) * dp
        lens = [len(w) for w in wavs]
        n44 = max(lens)
        bucket = int(self.hp.get("fused_bucket_samples", 0))
        if bucket:
            n44 = -(-n44 // bucket) * bucket
        # same mixed-batch rule as batched(): int16 wire only via the hp
        # flag or an all-int16 batch; float members never get quantized
        int16_wire = (bool(self.hp.get("fused_input_int16", False))
                      or all(np.asarray(w).dtype == np.int16 for w in wavs))
        stacked = np.zeros((n, n44), np.int16 if int16_wire else np.float32)
        for i, w in enumerate(wavs):
            stacked[i, : len(w)] = self.to_int16(w) if int16_wire \
                else self.to_float(w)
        if key_shifts is None:
            key_shifts = 0
        if np.ndim(key_shifts) == 0:
            key_shifts = [key_shifts] * n_true
        ks = np.zeros((n,), np.float32)
        ks[:n_true] = np.asarray(key_shifts, np.float32)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rngs = jax.random.split(rng, n)
        wav_o, f0_o, mel_o = self._get_sharded_batched_fn(n44, mesh)(
            self.params, self.hub_params, self._voc_run_params(),
            jnp.asarray(stacked), rngs, jnp.asarray(ks), jnp.int32(spk_id))
        hop = int(self.hp["hop_size"])
        out = []
        for i, ln in enumerate(lens):
            t_true = -(-ln // hop)
            out.append((wav_o[i, : min(ln, wav_o.shape[1])],
                        f0_o[i, :t_true], mel_o[i, :t_true]))
        return out
