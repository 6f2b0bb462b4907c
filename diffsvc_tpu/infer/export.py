"""Model export — the TPU-native analogue of the reference ONNX export.

The reference (``onnx_export.py`` + ``modules/diff/diffusion_V2.py``) splits
the model into encoder / denoiser / pred / after ONNX graphs for deployment.
Here each stage is exported as a serialized StableHLO artifact via
``jax.export`` — portable to any XLA runtime (TPU/GPU/CPU, IREE, PJRT
plugins) and reloadable with ``jax.export.deserialize``:

- ``encoder``:   (hubert, mel2ph, f0, uv, energy) -> cond
- ``denoiser``:  (x_t, t, cond) -> noise prediction (one PLMS/DDPM step body)
- ``sampler``:   (cond, noise) -> mel (full scan-PLMS loop, fixed speedup)
- ``vocoder``:   (mel, f0) -> waveform

Shapes are fixed per export (bucketed lengths), matching the reference's
fixed-shape ONNX graphs.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def _export_fn(fn, args, path: str):
    from jax import export as jexport

    exp = jexport.export(jax.jit(fn))(*args)
    with open(path, "wb") as f:
        f.write(exp.serialize())
    return path


def load_exported(path: str):
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read()).call


class SvcExporter:
    """Mirror of the reference SvcOnnx surface: wraps a converted diffusion
    checkpoint and writes per-stage artifacts."""

    def __init__(self, hp, params, vocoder=None):
        from ..models.diffusion import GaussianDiffusion

        self.hp = hp
        self.model = GaussianDiffusion(hp)
        self.params = params
        self.vocoder = vocoder

    def export(self, out_dir: str, t_mel: int = 1024, t_ph: int = 512,
               batch: int = 1, speedup: Optional[int] = None) -> Dict[str, str]:
        os.makedirs(out_dir, exist_ok=True)
        hp = self.hp
        h = hp["hidden_size"]
        m = hp["audio_num_mel_bins"]
        speedup = int(speedup or hp.get("pndm_speedup", 10) or 10)
        model, params = self.model, self.params

        hubert = jnp.zeros((batch, t_ph, h), jnp.float32)
        mel2ph = jnp.ones((batch, t_mel), jnp.int32)
        f0 = jnp.zeros((batch, t_mel), jnp.float32)
        uv = jnp.zeros((batch, t_mel), jnp.float32)
        energy = jnp.zeros((batch, t_mel), jnp.float32)
        x = jnp.zeros((batch, t_mel, m), jnp.float32)
        t = jnp.zeros((batch,), jnp.int32)
        cond = jnp.zeros((batch, t_mel, h), jnp.float32)

        from ..models import fs2

        def encoder_fn(hubert, mel2ph, f0, uv, energy):
            ret = fs2.apply(params["fs2"], model.fs2_cfg, hubert, mel2ph,
                            f0, uv, energy)
            return ret["decoder_inp"], ret["f0_denorm"]

        def denoiser_fn(x, t, cond):
            return model._dec.apply(params["denoise_fn"], model.net_cfg, x, t, cond)

        def sampler_fn(cond, noise):
            from ..models.diffusion import denorm_spec, p_sample_plms_scan

            def dn(x, tb):
                return model._dec.apply(params["denoise_fn"], model.net_cfg,
                                        x, tb, cond)

            x = p_sample_plms_scan(model.tables, dn, noise, model.cfg.K_step,
                                   speedup)
            return denorm_spec(x, model.spec_min, model.spec_max)

        paths = {
            "encoder": _export_fn(encoder_fn, (hubert, mel2ph, f0, uv, energy),
                                  os.path.join(out_dir, "encoder.stablehlo")),
            "denoiser": _export_fn(denoiser_fn, (x, t, cond),
                                   os.path.join(out_dir, "denoiser.stablehlo")),
            "sampler": _export_fn(sampler_fn, (cond, x),
                                  os.path.join(out_dir, "sampler.stablehlo")),
        }
        if self.vocoder is not None and hasattr(self.vocoder, "params"):
            from ..vocoders import generator as gen

            voc = self.vocoder

            def vocoder_fn(mel, f0v):
                return gen.apply(voc.params, voc.cfg, mel, f0v,
                                 jax.random.PRNGKey(0))

            paths["vocoder"] = _export_fn(
                vocoder_fn, (x, f0), os.path.join(out_dir, "vocoder.stablehlo"))

        meta = {"t_mel": t_mel, "t_ph": t_ph, "batch": batch,
                "speedup": speedup, "mel_bins": m, "hidden": h,
                "sample_rate": hp["audio_sample_rate"]}
        with open(os.path.join(out_dir, "export_meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        return paths


def export_fused(fused_svc, out_dir: str, n44: int) -> str:
    """Export the SINGLE-DISPATCH fused serving program for one length
    bucket as a self-contained StableHLO artifact (weights baked in as
    constants, like the reference's ONNX graphs bake theirs):

        (wav44 [n44] f32, rng_key uint32[2], key_shift f32, spk int32)
            -> (wav_out, f0, mel)

    The Pallas vocoder tail is excluded (a TPU-only custom call would make
    the artifact non-portable); the exported program uses the channel-
    packed XLA vocoder, which is numerically identical.  Consumption:
    ``tools/run_exported.py --fused`` or ``load_exported`` — verified
    bit-for-bit against the in-process FusedSvc in
    tests/test_export_misc.py.
    """
    os.makedirs(out_dir, exist_ok=True)
    from ..models.diffusion import GaussianDiffusion

    # force XLA everywhere: Mosaic tpu_custom_calls (the diffnet stack on a
    # TPU host, the vocoder tail) would make the artifact non-portable and
    # jax.export rejects them as non-stability-guaranteed
    hp_x = dict(fused_svc.hp)
    hp_x["diffnet_pallas"] = "off"
    fused = fused_svc._build(int(n44), model=GaussianDiffusion(hp_x),
                             use_voc_tail=False)
    params = fused_svc.params
    hub_params = fused_svc.hub_params
    voc_params = fused_svc._voc_run_params()
    if isinstance(voc_params, dict) and "wcat" in voc_params:
        voc_params = voc_params["packed"]

    def fn(wav44, rng_key, key_shift, spk):
        # rng_key is the raw uint32[2] PRNGKey data (the default jax key
        # representation), usable directly by fold_in/split inside
        return fused(params, hub_params, voc_params, wav44, rng_key,
                     key_shift, spk)

    args = (jnp.zeros((int(n44),), jnp.float32),
            jnp.zeros((2,), jnp.uint32),
            jnp.float32(0.0), jnp.int32(0))
    path = os.path.join(out_dir, f"fused_{int(n44)}.stablehlo")
    _export_fn(fn, args, path)
    meta_path = os.path.join(out_dir, "fused_meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    meta[str(int(n44))] = {
        "sample_rate": fused_svc.hp["audio_sample_rate"],
        "hop_size": fused_svc.hp["hop_size"],
        "speedup": fused_svc.speedup,
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2)
    return path
