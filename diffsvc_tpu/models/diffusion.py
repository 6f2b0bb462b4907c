"""Gaussian diffusion (DDPM + PLMS/PNDM) over normalized mel spectrograms.

Parity target: reference ``network/diff/diffusion.py`` — the β schedules,
the 12 derived tables, q_sample/p_losses, the DDPM posterior sampler and the
PLMS sampler with its 1/2/3/4-step Adams–Bashforth ladder.

TPU-native design: both samplers are a single ``jax.lax.scan`` whose body
calls the denoiser once (the PLMS warm-up step that needs a second call is a
``lax.switch`` branch taken only on the first iteration). The reference's
Python deque of past noises becomes a fixed [3, ...] ring buffer in the scan
carry. Mel layout is channels-last [B, T, M] throughout.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import diffnet, fs2


def linear_beta_schedule(timesteps: int, max_beta: float = 0.01) -> np.ndarray:
    return np.linspace(1e-4, max_beta, timesteps)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


beta_schedule = {"cosine": cosine_beta_schedule, "linear": linear_beta_schedule}


class DiffusionConfig(NamedTuple):
    # defaults match from_hparams' fallbacks (= the reference's defaults
    # when a config omits the keys: cosine schedule, max_beta 0.01 —
    # diffusion.py:40,82-87; the shipped configs set linear/0.02 explicitly)
    timesteps: int = 1000
    K_step: int = 1000
    loss_type: str = "l1"
    schedule_type: str = "cosine"
    max_beta: float = 0.01
    keep_bins: int = 80
    pndm_speedup: int = 0

    @classmethod
    def from_hparams(cls, hp):
        return cls(
            timesteps=int(hp.get("timesteps", 1000)),
            K_step=int(hp.get("K_step", 1000)),
            loss_type=hp.get("diff_loss_type", "l1"),
            schedule_type=hp.get("schedule_type", "cosine"),
            max_beta=float(hp.get("max_beta", 0.01)),
            keep_bins=int(hp.get("keep_bins", hp.get("audio_num_mel_bins", 80))),
            pndm_speedup=int(hp.get("pndm_speedup", 0) or 0),
        )


def make_tables(cfg: DiffusionConfig) -> dict:
    """The 12 derived schedule tables (pure function of config; float32).

    Mirrors reference ``diffusion.py:100-123`` — these are *not* checkpoint
    state, they are recomputed (so converted reference checkpoints skip them).
    """
    if cfg.schedule_type == "linear":
        betas = linear_beta_schedule(cfg.timesteps, cfg.max_beta)
    else:
        betas = cosine_beta_schedule(cfg.timesteps)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    t = {
        "betas": betas,
        "alphas_cumprod": alphas_cumprod,
        "alphas_cumprod_prev": alphas_cumprod_prev,
        "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod),
        "sqrt_one_minus_alphas_cumprod": np.sqrt(1.0 - alphas_cumprod),
        "log_one_minus_alphas_cumprod": np.log(1.0 - alphas_cumprod),
        "sqrt_recip_alphas_cumprod": np.sqrt(1.0 / alphas_cumprod),
        "sqrt_recipm1_alphas_cumprod": np.sqrt(1.0 / alphas_cumprod - 1),
        "posterior_variance": posterior_variance,
        "posterior_log_variance_clipped": np.log(np.maximum(posterior_variance, 1e-20)),
        "posterior_mean_coef1": betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod),
        "posterior_mean_coef2": (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod),
    }
    return {k: jnp.asarray(v, dtype=jnp.float32) for k, v in t.items()}


def _extract(table, t, ndim):
    """table[t] broadcast to an ndim-tensor shape ([B] -> [B, 1, 1, ...])."""
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


def norm_spec(x, spec_min, spec_max):
    return (x - spec_min) / (spec_max - spec_min) * 2.0 - 1.0


def denorm_spec(x, spec_min, spec_max):
    return (x + 1.0) / 2.0 * (spec_max - spec_min) + spec_min


def q_sample(tables, x_start, t, noise):
    return (_extract(tables["sqrt_alphas_cumprod"], t, x_start.ndim) * x_start
            + _extract(tables["sqrt_one_minus_alphas_cumprod"], t, x_start.ndim) * noise)


def p_losses(tables, denoise_fn, x_start, t, rng, loss_type: str = "l2",
             nonpadding=None, sample_mask=None):
    """Diffusion training loss. x_start: [B, T, M] normalized mel.

    ``sample_mask`` [B] marks real rows when the batch axis was padded up to
    the data-parallel multiple; reference numerics are untouched when absent.
    """
    noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
    x_noisy = q_sample(tables, x_start, t, noise)
    x_recon = denoise_fn(x_noisy, t)
    if loss_type == "l1":
        # reference semantics: time-masked but NOT renormalized over the
        # mask (diffusion.py:213-218). sample_mask (our batch-padding
        # extension) must renormalize over real rows, though — otherwise a
        # padded remainder batch scales loss/grads by nsamples/padded.
        err = jnp.abs(noise - x_recon)
        if nonpadding is not None:
            err = err * nonpadding[:, :, None]
        if sample_mask is not None:
            err = err * sample_mask[:, None, None]
            denom = jnp.maximum(sample_mask.sum(), 1.0) * err.shape[1] * err.shape[2]
            loss = err.sum() / denom
        else:
            loss = err.mean()
    elif loss_type == "l2":
        sq = (noise - x_recon) ** 2
        if sample_mask is not None:
            per_row = sq.mean(axis=(1, 2))
            loss = (per_row * sample_mask).sum() / jnp.maximum(sample_mask.sum(), 1.0)
        else:
            loss = jnp.mean(sq)
    else:
        raise NotImplementedError(loss_type)
    return loss


# ---------------------------------------------------------------------------
# Samplers — each one lax.scan
# ---------------------------------------------------------------------------

def p_sample_ddpm_scan(tables, denoise_fn, x, t_start: int, rng,
                       clip_denoised: bool = True):
    """Ancestral DDPM sampling from t_start-1 down to 0."""

    def body(carry, t):
        x, rng = carry
        rng, nkey = jax.random.split(rng)
        tb = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        noise_pred = denoise_fn(x, tb)
        x_recon = (_extract(tables["sqrt_recip_alphas_cumprod"], tb, x.ndim) * x
                   - _extract(tables["sqrt_recipm1_alphas_cumprod"], tb, x.ndim) * noise_pred)
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean = (_extract(tables["posterior_mean_coef1"], tb, x.ndim) * x_recon
                + _extract(tables["posterior_mean_coef2"], tb, x.ndim) * x)
        log_var = _extract(tables["posterior_log_variance_clipped"], tb, x.ndim)
        noise = jax.random.normal(nkey, x.shape, x.dtype)
        nonzero = (t > 0).astype(x.dtype)
        x = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        return (x, rng), None

    ts = jnp.arange(t_start - 1, -1, -1)
    (x, _), _ = jax.lax.scan(body, (x, rng), ts)
    return x


def _plms_x_pred(tables, x, noise_t, t, interval: int):
    """PLMS transfer function (reference diffusion.py:169-177)."""
    ndim = x.ndim
    a_t = _extract(tables["alphas_cumprod"], t, ndim)
    t_prev = jnp.maximum(t - interval, 0)
    a_prev = _extract(tables["alphas_cumprod"], t_prev, ndim)
    a_t_sq, a_prev_sq = jnp.sqrt(a_t), jnp.sqrt(a_prev)
    x_delta = (a_prev - a_t) * (
        (1.0 / (a_t_sq * (a_t_sq + a_prev_sq))) * x
        - 1.0 / (a_t_sq * (jnp.sqrt((1 - a_prev) * a_t) + jnp.sqrt((1 - a_t) * a_prev))) * noise_t)
    return x + x_delta


def p_sample_plms_scan(tables, denoise_fn, x, t_start: int, interval: int):
    """PLMS/PNDM sampling: steps t_start-interval*k for k=... down to 0.

    The noise ring buffer holds the last 3 predictions; the Adams–Bashforth
    order ramps 1->4 over the first steps exactly like the reference deque.
    """
    # reference grid: reversed(range(0, t_start, interval)) — ceil(t/i) steps
    # starting at the highest multiple of interval below t_start
    # (diffusion.py:272-274); floor would skip the noisiest step whenever
    # interval does not divide t_start
    n_steps = max(-(-t_start // interval), 1)
    ts = (jnp.arange(n_steps - 1, -1, -1) * interval).astype(jnp.int32)

    def body(carry, t):
        x, buf, count = carry  # buf: [3, B, T, M], newest at index 0
        tb = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        noise_pred = denoise_fn(x, tb)

        def order1(_):
            x_pred = _plms_x_pred(tables, x, noise_pred, tb, interval)
            tb_prev = jnp.maximum(tb - interval, 0)
            noise_pred_prev = denoise_fn(x_pred, tb_prev)
            return (noise_pred + noise_pred_prev) / 2.0

        def order2(_):
            return (3.0 * noise_pred - buf[0]) / 2.0

        def order3(_):
            return (23.0 * noise_pred - 16.0 * buf[0] + 5.0 * buf[1]) / 12.0

        def order4(_):
            return (55.0 * noise_pred - 59.0 * buf[0] + 37.0 * buf[1]
                    - 9.0 * buf[2]) / 24.0

        noise_prime = jax.lax.switch(
            jnp.minimum(count, 3), [order1, order2, order3, order4], None)
        x = _plms_x_pred(tables, x, noise_prime, tb, interval)
        buf = jnp.concatenate([noise_pred[None], buf[:2]], axis=0)
        return (x, buf, count + 1), None

    buf0 = jnp.zeros((3,) + x.shape, x.dtype)
    (x, _, _), _ = jax.lax.scan(body, (x, buf0, jnp.int32(0)), ts)
    return x


def dpmpp_timesteps(ac_np: np.ndarray, t_start: int, interval: int,
                    grid: str = "lambda") -> np.ndarray:
    """The DPM-Solver++ visiting ladder (host-side numpy): descending
    timesteps starting at t_start-1 and ending at 0.  Shared by the scan
    sampler below and the ONNX export (onnx/svc_export.py), so the
    deployed artifact walks the exact grid the in-process sampler uses."""
    # ceil like the PLMS grid so the first visited step is t_start-1 (the
    # initial x is pure noise calibrated there) for any interval
    n_steps = max(-(-t_start // interval), 1)
    if grid == "lambda":
        lam_np = 0.5 * (np.log(ac_np) - np.log(np.maximum(1.0 - ac_np, 1e-12)))
        target = np.linspace(lam_np[t_start - 1], lam_np[0], n_steps + 1)
        ts = np.array([int(np.abs(lam_np[:t_start] - tv).argmin())
                       for tv in target], np.int32)
        # lam is strictly monotonic in t so duplicates only appear when
        # n_steps approaches t_start; drop them (shortens the scan, host-side)
        keep = np.concatenate([[True], ts[1:] != ts[:-1]])
        ts = ts[keep]
        ts[-1] = 0
    else:
        # timesteps visited: t_start-interval*k (k=0..n_steps-1) then 0
        ts = np.concatenate([np.arange(n_steps - 1, -1, -1) * interval
                             + (interval - 1), [0]]).astype(np.int32)
        ts = np.clip(ts, 0, t_start - 1)
    return ts.astype(np.int32)


def p_sample_dpmpp_2m_scan(tables, denoise_fn, x, t_start: int, interval: int,
                           grid: str = "lambda"):
    """DPM-Solver++(2M) for epsilon prediction — a second-order exponential
    multistep solver (not in the reference; select with ``sampler: dpmpp``).

    Sampler choice is score-dependent (tests/test_dpmpp.py quantifies both
    regimes on analytic scores): on strongly peaked data (point mass) the
    data-prediction form is more accurate than PLMS at low NFE; on smooth
    scores PLMS's 4th-order multistep wins at every NFE, which is why
    ``plms`` stays the default. dpmpp's value is robustness at aggressive
    step counts (real denoisers at low NFE behave closer to the peaked
    regime than the smooth one).

    Data-prediction formulation over log-SNR lambda = log(alpha/sigma):
        x0_i   = (x_i - sigma_i * eps_i) / alpha_i
        D_i    = x0_i + (x0_i - x0_{i-1}) * (h_i / (2 h_{i-1}))   (2M term)
        x_{i+1}= (sigma_{i+1}/sigma_i) x_i - alpha_{i+1} expm1(-h_i) D_i
    with h_i = lambda_{i+1} - lambda_i; first step falls back to 1st order.

    ``grid``: "lambda" (default) visits the discrete timesteps closest to a
    uniform log-SNR spacing — the standard DPM-Solver grid, measurably more
    accurate at equal NFE than uniform-t; "t" keeps the PLMS-style uniform
    timestep grid. Both grids are host-side numpy at trace time; the scan
    length (= NFE) is identical.
    """
    ts = dpmpp_timesteps(np.asarray(tables["alphas_cumprod"]), t_start,
                         interval, grid)
    ac = tables["alphas_cumprod"]
    alpha = jnp.sqrt(ac)
    sigma = jnp.sqrt(1.0 - ac)
    lam = jnp.log(alpha) - jnp.log(jnp.maximum(sigma, 1e-12))

    def body(carry, inp):
        x, x0_prev, h_prev, have_prev = carry
        t_cur, t_next = inp
        tb = jnp.full((x.shape[0],), t_cur, dtype=jnp.int32)
        eps = denoise_fn(x, tb)
        a_c, s_c = alpha[t_cur], jnp.maximum(sigma[t_cur], 1e-12)
        x0 = (x - s_c * eps) / jnp.maximum(a_c, 1e-12)

        h = lam[t_next] - lam[t_cur]
        r = h / jnp.maximum(jnp.abs(h_prev), 1e-12) * jnp.sign(h_prev + 1e-30)
        d_2m = x0 + (x0 - x0_prev) * (0.5 * r)
        d = jnp.where(have_prev > 0, d_2m, x0)

        a_n, s_n = alpha[t_next], jnp.maximum(sigma[t_next], 1e-12)
        x_next = (s_n / s_c) * x - a_n * jnp.expm1(-h) * d
        return (x_next, x0, h, jnp.float32(1.0)), None

    pairs = (jnp.asarray(ts[:-1]), jnp.asarray(ts[1:]))
    init = (x, jnp.zeros_like(x), jnp.float32(1.0), jnp.float32(0.0))
    (x, _, _, _), _ = jax.lax.scan(body, init, pairs)
    # final step lands on t=0: return the data prediction there
    tb0 = jnp.zeros((x.shape[0],), jnp.int32)
    eps0 = denoise_fn(x, tb0)
    x0 = (x - jnp.maximum(sigma[0], 1e-12) * eps0) / jnp.maximum(alpha[0], 1e-12)
    return x0


# ---------------------------------------------------------------------------
# Full model: conditioner + denoiser + samplers
# ---------------------------------------------------------------------------

class GaussianDiffusion:
    """Bundles configs/tables and exposes pure train/infer functions.

    Holds no mutable state; ``params`` pytrees are passed explicitly.
    """

    def __init__(self, hp):
        self.hp = hp
        self.cfg = DiffusionConfig.from_hparams(hp)
        self.fs2_cfg = fs2.FS2Config.from_hparams(hp)
        # DIFF_DECODERS (reference SVC_task.py:19-23): wavenet | fft
        self.decoder_type = hp.get("diff_decoder_type", "wavenet")
        if self.decoder_type == "fft":
            from . import candidate_decoder

            self._dec = candidate_decoder
            self.net_cfg = candidate_decoder.FFTDecoderConfig.from_hparams(hp)
        else:
            self._dec = diffnet
            self.net_cfg = diffnet.DiffNetConfig.from_hparams(hp)
        self.tables = make_tables(self.cfg)
        self.mel_bins = self.net_cfg.in_dims
        spec_min = np.asarray(hp.get("spec_min", [-6.0]), np.float32)
        spec_max = np.asarray(hp.get("spec_max", [1.5]), np.float32)
        if spec_min.size == 1:
            spec_min = np.full((self.mel_bins,), spec_min.item(), np.float32)
        if spec_max.size == 1:
            spec_max = np.full((self.mel_bins,), spec_max.item(), np.float32)
        self.spec_min = jnp.asarray(spec_min[: self.cfg.keep_bins])
        self.spec_max = jnp.asarray(spec_max[: self.cfg.keep_bins])

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        return {"fs2": fs2.init(k1, self.fs2_cfg),
                "denoise_fn": self._dec.init(k2, self.net_cfg)}

    def _denoise_closure(self, params, cond, hoist_cond: bool = False,
                         inference: bool = False):
        # ``inference=True`` (samplers only) lets the wavenet decoder take
        # the Pallas residual-stack kernel; training keeps the
        # differentiable scan and non-wavenet decoders ignore the flag.
        # optional reduced-precision sampling: the denoiser runs in bf16
        # (MXU-native), the PLMS/DDPM update math stays float32
        dtype = jnp.bfloat16 if str(self.hp.get("diff_compute_dtype", "")) in (
            "bf16", "bfloat16") else jnp.float32

        def cast(tree):
            return jax.tree.map(
                lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, tree)

        if hoist_cond and self.decoder_type == "wavenet":
            # pre-project the conditioner once; the sampling scan then skips
            # the per-NFE conditioner matmuls
            dn_params = cast(params["denoise_fn"])
            cond_proj = cast(self._dec.prepare_cond(params["denoise_fn"], cond))

            def fn(x, t):
                out = self._dec.apply(dn_params, self.net_cfg,
                                      x.astype(dtype), t, cond_proj=cond_proj,
                                      inference=inference)
                return out.astype(jnp.float32)
            return fn

        dn_params = cast(params["denoise_fn"])
        cond_c = cast(cond)

        if self.decoder_type == "wavenet":
            def fn(x, t):
                out = self._dec.apply(dn_params, self.net_cfg,
                                      x.astype(dtype), t, cond_c,
                                      inference=inference)
                return out.astype(jnp.float32)
            return fn

        def fn(x, t):
            out = self._dec.apply(dn_params, self.net_cfg, x.astype(dtype), t,
                                  cond_c)
            return out.astype(jnp.float32)
        return fn

    def _try_plms_ladder(self, params, cond, x, t_start: int, interval: int,
                         clip_v: float, sampler: str = "plms"):
        """Whole-ladder Pallas sampling (ops/pallas/plms_ladder.py): every
        denoiser evaluation AND the sampler update in one kernel, x
        resident in VMEM across the trajectory; covers PLMS and
        DPM-Solver++(2M), each with optional sampler_clip_x0.  Returns the
        sampled x, or None when the configuration keeps the scan (flag
        off, non-wavenet decoder, batch > 1, fp32 sampling, off-TPU, or
        unaligned shapes).  ``sampler_pallas_ladder: auto`` enables it for
        bf16 TPU serving; numerics parity with the scans is tested in
        tests/test_plms_ladder.py."""
        mode = str(self.hp.get("sampler_pallas_ladder", "off")).lower()
        if mode not in ("auto", "on", "interpret"):
            return None
        if self.decoder_type != "wavenet" or x.shape[0] != 1:
            return None
        from ..ops.pallas import plms_ladder as _pl

        cfg = self.net_cfg
        interp = mode == "interpret"
        dtype = jnp.bfloat16 if str(self.hp.get("diff_compute_dtype", "")) in (
            "bf16", "bfloat16") else jnp.float32
        esz = 2 if interp else jnp.dtype(dtype).itemsize
        want = interp or jax.default_backend() == "tpu"
        _, t_mel, m = x.shape
        if not (want and _pl.supported_ladder(
                cfg.residual_layers, cfg.dilation_cycle_length, t_mel,
                cfg.residual_channels, m, esize=esz)):
            return None

        def cast(tree):
            return jax.tree.map(
                lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
                tree)

        dn = params["denoise_fn"]
        dnc = cast(dn)
        # hoisted conditioner exactly like _denoise_closure: projected in
        # f32, cast once
        cond_proj = cast(self._dec.prepare_cond(dn, cond))[:, 0]  # [L,T,2C]

        # per-eval step biases through the (compute-dtype) step MLP — the
        # same math diffnet.apply runs per evaluation, batched over evals
        from . import nn
        if sampler == "dpmpp":
            t_eval_np, scal_np = _pl.dpmpp_eval_tables(
                self.tables["alphas_cumprod"], t_start, interval, m,
                grid=str(self.hp.get("dpmpp_grid", "lambda")))
        else:
            t_eval_np, scal_np = _pl.plms_eval_tables(
                self.tables["alphas_cumprod"], t_start, interval, m,
                clip=clip_v > 0)
        stp = nn.sinusoidal_pos_emb(jnp.asarray(t_eval_np),
                                    cfg.residual_channels)
        stp = nn.linear(dnc["mlp"]["w1"], stp)
        stp = nn.mish(stp)
        stp = nn.linear(dnc["mlp"]["w2"], stp).astype(dtype)  # [J, C]
        dp = dnc["layers"]["diffusion_projection"]
        sb = (jnp.einsum("jc,lcd->jld", stp, dp["w"])
              + dp["b"][None, :, :]).astype(dtype)            # [J, L, C]
        n_evals, n_layers = sb.shape[0], cfg.residual_layers

        out = _pl.plms_ladder(
            x[0].astype(jnp.float32), jnp.asarray(scal_np),
            sb.reshape(n_evals * n_layers, 1, -1), cond_proj,
            dnc["input_projection"]["w"][0],
            dnc["input_projection"]["b"][None, :],
            dnc["skip_projection"]["w"][0],
            dnc["skip_projection"]["b"][None, :],
            dnc["output_projection"]["w"][0],
            dnc["output_projection"]["b"][None, :],
            dnc["layers"]["dilated_conv"]["w"],
            dnc["layers"]["dilated_conv"]["b"][:, None, :],
            dnc["layers"]["output_projection"]["w"][:, 0],
            dnc["layers"]["output_projection"]["b"][:, None, :],
            cycle=cfg.dilation_cycle_length, n_layers=n_layers,
            clip_v=clip_v, interpret=interp)
        return out[None]

    def training_loss(self, params, batch, rng, train: bool = True):
        """batch: dict with hubert, mel2ph, f0, uv, energy, mels [B,T,M].

        ``train=False`` (validation) disables dropout like the reference's
        eval mode."""
        t_rng, n_rng, fs2_rng = jax.random.split(rng, 3)
        # fs2-full (no_fs2: false) trains its transformer with dropout like
        # the reference (EncSALayer, common_layers.py:581,588); the default
        # no_fs2 path has no transformer so it stays deterministic
        train_fs2 = (train and not self.fs2_cfg.no_fs2
                     and self.fs2_cfg.dropout > 0)
        ret = fs2.apply(params["fs2"], self.fs2_cfg, batch["hubert"],
                        batch["mel2ph"], batch["f0"], batch.get("uv"),
                        batch.get("energy"), batch.get("spk_embed"),
                        deterministic=not train_fs2,
                        rng=fs2_rng if train_fs2 else None)
        cond = ret["decoder_inp"]
        b = cond.shape[0]
        t = jax.random.randint(t_rng, (b,), 0, self.cfg.K_step)
        x_start = norm_spec(batch["mels"], self.spec_min, self.spec_max)
        nonpadding = (batch["mel2ph"] > 0).astype(x_start.dtype)
        loss = p_losses(self.tables, self._denoise_closure(params, cond),
                        x_start, t, n_rng, self.cfg.loss_type, nonpadding,
                        sample_mask=batch.get("sample_mask"))
        return loss, ret

    def infer(self, params, batch, rng, *, speedup: Optional[int] = None,
              use_gt_mel: bool = False, add_noise_step: int = 500,
              init_noise=None):
        """Full sampling; returns dict with 'mel_out' [B, T, M] and
        'f0_denorm'. ``init_noise`` ([B, T, M]) overrides the x_T draw —
        used by the reference-parity harness to share noise with the torch
        sampler (reference network/diff/diffusion.py:268)."""
        ret = fs2.apply(params["fs2"], self.fs2_cfg, batch["hubert"],
                        batch["mel2ph"], batch["f0"], batch.get("uv"),
                        batch.get("energy"), batch.get("spk_embed"))
        cond = ret["decoder_inp"]
        b, t_mel, _ = cond.shape
        denoise_fn = self._denoise_closure(params, cond, hoist_cond=True,
                                           inference=True)
        noise_rng, samp_rng = jax.random.split(rng)

        if use_gt_mel:
            t_start = int(add_noise_step)
            x0 = norm_spec(batch["mels"], self.spec_min, self.spec_max)
            tvec = jnp.full((b,), t_start - 1, dtype=jnp.int32)
            x = q_sample(self.tables, x0, tvec,
                         jax.random.normal(noise_rng, x0.shape, x0.dtype))
        else:
            t_start = self.cfg.K_step
            if init_noise is not None:
                x = jnp.asarray(init_noise)
            else:
                x = jax.random.normal(noise_rng, (b, t_mel, self.mel_bins))

        speedup = self.cfg.pndm_speedup if speedup is None else speedup
        sampler = str(self.hp.get("sampler", "plms")).lower()
        # optional x0 static thresholding (OFF by default = reference
        # parity): clamp the data prediction to +/- sampler_clip_x0 in the
        # normalized spec domain and rewrite eps accordingly. Multistep
        # solvers on an imperfect score can overshoot far outside the data
        # range at aggressive step counts (quantified by
        # tools/sampler_quality.py); the clamp bounds every update without
        # touching the well-conditioned path.
        clip_v = float(self.hp.get("sampler_clip_x0", 0) or 0)
        if clip_v > 0:
            base_fn, tables = denoise_fn, self.tables

            def denoise_fn(xv, tv):
                eps = base_fn(xv, tv)
                a = _extract(tables["sqrt_alphas_cumprod"], tv, xv.ndim)
                s = jnp.maximum(_extract(
                    tables["sqrt_one_minus_alphas_cumprod"], tv, xv.ndim),
                    1e-12)
                x0 = (xv - s * eps) / jnp.maximum(a, 1e-12)
                x0 = jnp.clip(x0, -clip_v, clip_v)
                return (xv - a * x0) / s
        if speedup and speedup > 1 and sampler in ("dpmpp", "dpm++", "dpm_solver"):
            xl = self._try_plms_ladder(params, cond, x, t_start,
                                       int(speedup), clip_v,
                                       sampler="dpmpp")
            x = xl if xl is not None else p_sample_dpmpp_2m_scan(
                self.tables, denoise_fn, x, t_start, int(speedup),
                grid=str(self.hp.get("dpmpp_grid", "lambda")))
        elif speedup and speedup > 1:
            xl = self._try_plms_ladder(params, cond, x, t_start,
                                       int(speedup), clip_v)
            x = xl if xl is not None else p_sample_plms_scan(
                self.tables, denoise_fn, x, t_start, int(speedup))
        else:
            x = p_sample_ddpm_scan(self.tables, denoise_fn, x, t_start, samp_rng)

        mel_out = denorm_spec(x, self.spec_min, self.spec_max)
        if batch.get("mel2ph") is not None:
            mel_out = mel_out * (batch["mel2ph"] > 0).astype(mel_out.dtype)[:, :, None]
        ret["mel_out"] = mel_out
        return ret


class OfflineGaussianDiffusion(GaussianDiffusion):
    """Variant taking precomputed fs2 mels as the sampling start
    (reference diffusion.py:299-332; unused by the SVC task). ``ref_mels``
    is (gt_mels, fs2_mels): training uses gt, inference q_samples from the
    fs2 mel at K_step-1 unless ``gaussian_start``."""

    def infer(self, params, batch, rng, *, speedup=None, **kwargs):
        fs2_mels = batch.get("fs2_mels")
        if fs2_mels is None or self.hp.get("gaussian_start", True):
            return super().infer(params, batch, rng, speedup=speedup, **kwargs)
        b2 = dict(batch)
        b2["mels"] = fs2_mels
        return super().infer(params, b2, rng, speedup=speedup,
                             use_gt_mel=True, add_noise_step=self.cfg.K_step)
