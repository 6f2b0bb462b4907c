"""The reference's four split ONNX artifacts, emitted from the JAX models.

Behavior target: reference ``onnx_export.py`` +
``modules/diff/diffusion_V2.py:252-352`` (torch.onnx, opset 16).  Artifact
names, graph input/output names, dtypes, and dynamic axes match the
reference export exactly, so downstream community consumers (the VST /
MoeSS-style inference hosts that load ``{proj}_encoder.onnx`` etc.) can
consume these files unchanged:

- ``{proj}_encoder.onnx``  (hubert[1,T_ph,H] f32, mel2ph[1,T] i64,
                            spk_embed[1] i64, f0[1,T] f32)
                           -> mel_pred[1,H,T] (the condition), f0_pred[1,T]
- ``{proj}_denoise.onnx``  (noise[1,1,M,T] f32, time[1] i64,
                            condition[1,H,T] f32) -> noise_pred[1,1,M,T]
- ``{proj}_pred.onnx``     (noise, noise_pred, time, time_prev) -> PLMS
                           first-order x_pred (diffusion_V2.py:168-180)
- ``{proj}_after.onnx``    x[1,1,M,T] -> mel_out[1,M,T]: denorm +
                           log10->ln (x2.30259) (diffusion_V2.py:153-165)

Notes vs the reference:
- the reference's exported SvcEncoder ADDS the integer ``spk_embed``
  tensor (always 0 for single-speaker exports, diffusion_V2.py:97-107);
  with ``use_spk_id`` we instead export the real speaker-embedding lookup.
- ``time``/``time_prev``/``mel2ph``/``spk_embed`` are declared int64 like
  torch exports; a Cast node feeds the int32 TPU-side graph.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from .convert import export_onnx


def export_svc_onnx(hp, params, out_dir: str, project_name: str,
                    t_ph: int = 10, t_mel: int = 10) -> Dict[str, str]:
    """Write the four artifacts; returns {stage: path}.

    ``params`` is the GaussianDiffusion params pytree ({"fs2", "denoise_fn"},
    e.g. from utils.convert_torch.convert_gaussian_diffusion).
    """
    import jax.numpy as jnp

    from ..models import fs2
    from ..models.diffusion import GaussianDiffusion

    model = GaussianDiffusion(hp)
    fs2_cfg = model.fs2_cfg
    h = int(hp["hidden_size"])
    m = int(model.mel_bins)
    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    # --- encoder -----------------------------------------------------------
    use_spk = bool(fs2_cfg.use_spk_id)

    def enc_fn(hubert, mel2ph, spk_embed, f0):
        ret = fs2.apply(params["fs2"], fs2_cfg, hubert, mel2ph, f0,
                        spk_embed=spk_embed if use_spk else None)
        cond = ret["decoder_inp"]
        return cond.transpose(0, 2, 1), ret["f0_denorm"]

    enc_args = (jnp.zeros((1, t_ph, h), jnp.float32),
                jnp.ones((1, t_mel), jnp.int32),
                jnp.zeros((1,), jnp.int32),
                jnp.full((1, t_mel), 6.0, jnp.float32))
    enc_path = os.path.join(out_dir, f"{project_name}_encoder.onnx")
    with open(enc_path, "wb") as f:
        f.write(export_onnx(
            enc_fn, enc_args,
            input_names=["hubert", "mel2ph", "spk_embed", "f0"],
            output_names=["mel_pred", "f0_pred"],
            dynamic_axes={"hubert": [1], "mel2ph": [1], "f0": [1]},
            input_casts={"mel2ph": 7, "spk_embed": 7},  # INT64
            graph_name="encoder",
            doc=f"diff-svc encoder ({project_name}); "
                "parity: reference modules/encoder.py:101-110"))
    paths["encoder"] = enc_path

    # --- denoiser ----------------------------------------------------------
    def den_fn(noise, time, condition):
        spec = noise[:, 0].transpose(0, 2, 1)        # [B, T, M]
        cond = condition.transpose(0, 2, 1)          # [B, T, H]
        out = model._dec.apply(params["denoise_fn"], model.net_cfg,
                               spec, time, cond=cond)
        return out.transpose(0, 2, 1)[:, None]       # [B, 1, M, T]

    den_args = (jnp.zeros((1, 1, m, t_mel), jnp.float32),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, h, t_mel), jnp.float32))
    den_path = os.path.join(out_dir, f"{project_name}_denoise.onnx")
    with open(den_path, "wb") as f:
        f.write(export_onnx(
            den_fn, den_args,
            input_names=["noise", "time", "condition"],
            output_names=["noise_pred"],
            dynamic_axes={"noise": [3], "condition": [2]},
            input_casts={"time": 7},
            graph_name="denoise",
            doc=f"diff-svc DiffNet denoiser ({project_name}); "
                "parity: reference modules/diff/net.py DiffNet"))
    paths["denoise"] = den_path

    # --- pred (PLMS first-order x_pred) ------------------------------------
    alphas_cumprod = jnp.asarray(model.tables["alphas_cumprod"], jnp.float32)

    def pred_fn(noise, noise_pred, time, time_prev):
        a_t = alphas_cumprod[time][:, None, None, None]
        a_prev = alphas_cumprod[time_prev][:, None, None, None]
        a_t_sq, a_prev_sq = jnp.sqrt(a_t), jnp.sqrt(a_prev)
        x_delta = (a_prev - a_t) * (
            (1.0 / (a_t_sq * (a_t_sq + a_prev_sq))) * noise
            - 1.0 / (a_t_sq * (jnp.sqrt((1.0 - a_prev) * a_t)
                               + jnp.sqrt((1.0 - a_t) * a_prev))) * noise_pred)
        return noise + x_delta

    pr_args = (jnp.zeros((1, 1, m, t_mel), jnp.float32),
               jnp.zeros((1, 1, m, t_mel), jnp.float32),
               jnp.zeros((1,), jnp.int32),
               jnp.zeros((1,), jnp.int32))
    pred_path = os.path.join(out_dir, f"{project_name}_pred.onnx")
    with open(pred_path, "wb") as f:
        f.write(export_onnx(
            pred_fn, pr_args,
            input_names=["noise", "noise_pred", "time", "time_prev"],
            output_names=["noise_pred_o"],
            dynamic_axes={"noise": [3], "noise_pred": [3]},
            input_casts={"time": 7, "time_prev": 7},
            graph_name="pred",
            doc="PLMS x_pred step; parity: reference "
                "modules/diff/diffusion_V2.py:168-180"))
    paths["pred"] = pred_path

    # --- after (denorm + log10->ln) -----------------------------------------
    spec_min = jnp.asarray(model.spec_min)[None, None, :]   # [1,1,M]
    spec_max = jnp.asarray(model.spec_max)[None, None, :]

    def after_fn(x):
        y = x[:, 0].transpose(0, 2, 1)                       # [B, T, M]
        d = (spec_max - spec_min) / 2.0
        mid = (spec_max + spec_min) / 2.0
        mel_out = (y * d + mid) * 2.30259
        return mel_out.transpose(0, 2, 1)                    # [B, M, T]

    af_args = (jnp.zeros((1, 1, m, t_mel), jnp.float32),)
    after_path = os.path.join(out_dir, f"{project_name}_after.onnx")
    with open(after_path, "wb") as f:
        f.write(export_onnx(
            after_fn, af_args,
            input_names=["x"], output_names=["mel_out"],
            dynamic_axes={"x": [3]},
            graph_name="after",
            doc="denorm + ln-mel; parity: reference "
                "modules/diff/diffusion_V2.py:153-165"))
    paths["after"] = after_path
    return paths


def export_dpmpp_onnx(hp, out_dir: str, project_name: str,
                      speedup: Optional[int] = None,
                      t_mel: int = 10) -> Dict[str, str]:
    """Write ``{proj}_dpmpp.onnx`` + ``{proj}_dpmpp_meta.json``: the
    DPM-Solver++(2M) update step for the fast serving profile
    (configs/config_44k_fast.yaml), deployable next to the reference-shaped
    PLMS graphs (VERDICT r3 #8; graph contract style follows the reference
    ``_pred`` artifact, modules/diff/diffusion_V2.py:252-352).

    The graph computes ONE solver step with every per-step coefficient
    (log-SNR grid spacing, alpha/sigma ratios, the 2M multistep weight,
    optional x0 static thresholding) baked in as tables indexed by the
    ``step`` input, so the host loop is trivial:

        x0_prev = zeros; ts = meta["timesteps"]        # len S, ts[-1] == 0
        for i in range(S):
            eps = denoise(x, [ts[i]], cond)
            x, x0_prev = dpmpp(x, eps, x0_prev, [i])
        mel = after(x)                                  # final x == x0(t=0)

    The first step's 2M weight is 0 (first-order bootstrap) and the last
    entry has c_x=0, c_d=1 so x_next is the data prediction at t=0 —
    exactly the in-process sampler (models/diffusion.py
    p_sample_dpmpp_2m_scan), same ladder via the shared dpmpp_timesteps().
    """
    import json as _json

    import jax.numpy as jnp

    from ..models.diffusion import GaussianDiffusion, dpmpp_timesteps

    model = GaussianDiffusion(hp)
    m = int(model.mel_bins)
    k_step = int(model.cfg.K_step)
    speedup = int(speedup or hp.get("pndm_speedup", 20) or 20)
    grid = str(hp.get("dpmpp_grid", "lambda"))
    clip_v = float(hp.get("sampler_clip_x0", 0) or 0)

    ac = np.asarray(model.tables["alphas_cumprod"], np.float64)
    ts = dpmpp_timesteps(ac, k_step, speedup, grid)      # len S, ts[-1]=0
    alpha = np.sqrt(ac)
    sigma = np.sqrt(np.maximum(1.0 - ac, 0.0))
    lam = np.log(alpha) - np.log(np.maximum(sigma, 1e-12))

    S = len(ts)
    inv_a = 1.0 / np.maximum(alpha[ts], 1e-12)            # x0 from (x, eps)
    soa = np.maximum(sigma[ts], 1e-12) / np.maximum(alpha[ts], 1e-12)
    c_x = np.zeros(S)
    c_d = np.zeros(S)
    r_half = np.zeros(S)
    h_prev = None
    for i in range(S - 1):
        t_c, t_n = int(ts[i]), int(ts[i + 1])
        h = lam[t_n] - lam[t_c]
        s_c = max(sigma[t_c], 1e-12)
        c_x[i] = max(sigma[t_n], 1e-12) / s_c
        c_d[i] = -alpha[t_n] * np.expm1(-h)
        r_half[i] = 0.0 if h_prev is None else 0.5 * h / h_prev
        h_prev = h
    c_x[S - 1] = 0.0   # final entry: x_next = x0(t=0)
    c_d[S - 1] = 1.0

    inv_a_j = jnp.asarray(inv_a, jnp.float32)
    soa_j = jnp.asarray(soa, jnp.float32)
    c_x_j = jnp.asarray(c_x, jnp.float32)
    c_d_j = jnp.asarray(c_d, jnp.float32)
    rh_j = jnp.asarray(r_half, jnp.float32)

    def dpmpp_fn(noise, noise_pred, x0_prev, step):
        b = step[:, None, None, None]
        x0 = noise * inv_a_j[b] - noise_pred * soa_j[b]
        if clip_v > 0:   # folded x0 thresholding == the eps-rewrite wrapper
            x0 = jnp.clip(x0, -clip_v, clip_v)
        d = x0 + (x0 - x0_prev) * rh_j[b]
        x_next = c_x_j[b] * noise + c_d_j[b] * d
        return x_next, x0

    args = (jnp.zeros((1, 1, m, t_mel), jnp.float32),
            jnp.zeros((1, 1, m, t_mel), jnp.float32),
            jnp.zeros((1, 1, m, t_mel), jnp.float32),
            jnp.zeros((1,), jnp.int32))
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{project_name}_dpmpp.onnx")
    with open(path, "wb") as f:
        f.write(export_onnx(
            dpmpp_fn, args,
            input_names=["noise", "noise_pred", "x0_prev", "step"],
            output_names=["x_next", "x0"],
            dynamic_axes={"noise": [3], "noise_pred": [3], "x0_prev": [3]},
            input_casts={"step": 7},
            graph_name="dpmpp",
            doc=f"DPM-Solver++(2M) step ({project_name}); in-repo sampler "
                "models/diffusion.py p_sample_dpmpp_2m_scan (not in the "
                "reference export surface)"))
    meta_path = os.path.join(out_dir, f"{project_name}_dpmpp_meta.json")
    with open(meta_path, "w") as f:
        _json.dump({"timesteps": [int(t) for t in ts], "K_step": k_step,
                    "speedup": speedup, "grid": grid,
                    "sampler_clip_x0": clip_v}, f)
    return {"dpmpp": path, "dpmpp_meta": meta_path}


def export_vocoder_onnx(cfg, params, out_dir: str, project_name: str,
                        t_mel: int = 10) -> str:
    """Write ``{proj}_hifigan.onnx``: the (NSF-)HiFi-GAN generator as one
    ONNX graph, completing the exported chain (the reference exports only
    the four diffusion graphs and leaves the vocoder to separately
    published community artifacts).

    Inputs (dynamic T, L = T * prod(upsample_rates)):

    - ``mel``  f32[1, M, T]  natural-log mel (what ``_after`` emits /
      the NSF wrapper feeds, reference ``network/vocoders/nsf_hifigan.py``)
    - ``f0``   f32[1, T]     Hz (NSF configs only)
    - ``rand_ini`` f32[1, H+1]  U[0,1) initial harmonic phases
    - ``noise``    f32[1, H+1, L] N(0,1) source noise

    The source randomness is declared as graph inputs instead of in-graph
    RNG ops so the artifact is deterministic and bit-testable; hosts feed
    U/N draws (or zeros for reproducible output). ``params``/``cfg`` come
    from :func:`diffsvc_tpu.vocoders.nsf_hifigan.load_model`.
    """
    import jax.numpy as jnp

    from ..vocoders import generator as G

    os.makedirs(out_dir, exist_ok=True)
    total_up = int(np.prod(cfg.upsample_rates))
    h = cfg.harmonic_num + 1
    m = cfg.num_mels
    L = t_mel * total_up
    use_nsf = bool(cfg.use_nsf)

    if use_nsf:
        def voc_fn(mel, f0, rand_ini, noise):
            f0_up = G.upsample_nearest(f0, total_up)
            # length-robust first-sample mask: built from the input so the
            # dynamic-length symbol survives into the ONNX graph (an iota
            # mask would be baked at the trace length)
            ones = f0_up[0] * 0.0 + 1.0
            lane0 = (jnp.cumsum(ones) == 1.0).astype(jnp.float32)
            har, _ = G.source_module_from_randoms(
                params["m_source"], rand_ini, noise, f0_up,
                cfg.sampling_rate, cfg.harmonic_num, lane0=lane0)
            return G.apply_conv_stack(params, cfg, mel.transpose(0, 2, 1),
                                      har)

        args = (jnp.zeros((1, m, t_mel), jnp.float32),
                jnp.full((1, t_mel), 220.0, jnp.float32),
                jnp.zeros((1, h), jnp.float32),
                jnp.zeros((1, h, L), jnp.float32))
        input_names = ["mel", "f0", "rand_ini", "noise"]
        dynamic_axes = {"mel": [2], "f0": [1], "noise": [2]}
    else:
        def voc_fn(mel):
            return G.apply_conv_stack(params, cfg, mel.transpose(0, 2, 1))

        args = (jnp.zeros((1, m, t_mel), jnp.float32),)
        input_names = ["mel"]
        dynamic_axes = {"mel": [2]}

    path = os.path.join(out_dir, f"{project_name}_hifigan.onnx")
    with open(path, "wb") as f:
        f.write(export_onnx(
            voc_fn, args, input_names=input_names, output_names=["waveform"],
            dynamic_axes=dynamic_axes, graph_name="hifigan",
            doc=f"(NSF-)HiFi-GAN generator ({project_name}); total_up="
                f"{total_up} ; parity: reference "
                "modules/nsf_hifigan/models.py:325-396"))
    return path


def export_istft_onnx(cfg, params, out_dir: str, project_name: str,
                      t_mel: int = 430) -> str:
    """Write ``{proj}_istft.onnx``: the iSTFT-head vocoder
    (vocoders/istft_head.py, beyond-reference family) as one ONNX graph.

    Inputs:

    - ``mel`` f32[1, T, M]  log10-mel (the diffusion output domain)
    - ``f0``  f32[1, T]     Hz (only when ``cfg.use_f0``)

    FIXED length (no dynamic axes): the normalized overlap-add envelope
    in ops/istft.py is a trace-time constant shaped by T, so a graph is
    exact only at its trace length. Export one artifact per serving
    bucket (the same bucketing the fused serving path uses);
    ``t_mel=430`` is the 10 s @ 44.1 kHz/512 bucket.
    """
    import jax.numpy as jnp

    from ..vocoders import istft_head as ih

    os.makedirs(out_dir, exist_ok=True)
    m = cfg.num_mels
    if cfg.use_f0:
        def voc_fn(mel, f0):
            return ih.apply(params, cfg, mel, f0)

        args = (jnp.zeros((1, t_mel, m), jnp.float32),
                jnp.full((1, t_mel), 220.0, jnp.float32))
        input_names = ["mel", "f0"]
    else:
        def voc_fn(mel):
            return ih.apply(params, cfg, mel)

        args = (jnp.zeros((1, t_mel, m), jnp.float32),)
        input_names = ["mel"]

    path = os.path.join(out_dir, f"{project_name}_istft.onnx")
    with open(path, "wb") as f:
        f.write(export_onnx(
            voc_fn, args, input_names=input_names, output_names=["waveform"],
            dynamic_axes=None, graph_name="istft_head",
            doc=f"iSTFT-head vocoder ({project_name}), fixed T={t_mel}; "
                "beyond-reference family (vocoders/istft_head.py)"))
    return path


class SvcOnnx:
    """CLI-facing facade mirroring the reference ``SvcOnnx`` usage
    (reference onnx_export.py:6-17): load a project checkpoint, call
    ``OnnxExport(project_name)``."""

    def __init__(self, project_name: str, config_path: str,
                 hubert_gpu: bool = False,
                 model_path: Optional[str] = None):
        from ..config.hparams import set_hparams
        from ..utils import convert_torch as cvt

        self.project_name = project_name
        self.hp = set_hparams(config=config_path, exp_name=project_name,
                              infer=True, reset=True, hparams_str="",
                              print_hparams=False)
        self.params = cvt.convert_gaussian_diffusion(model_path, self.hp)

    def OnnxExport(self, project_name: Optional[str] = None,
                   out_dir: str = ".") -> Dict[str, str]:
        return export_svc_onnx(self.hp, self.params, out_dir,
                               project_name or self.project_name)
