"""Pallas TPU kernel: an ENTIRE sampling ladder (PLMS or DPM-Solver++ 2M)
in one kernel.

Why: ``ops/pallas/diffnet_stack.residual_stack`` already fuses the 20
residual layers of one denoiser evaluation, but between evaluations the
sampler state still round-trips XLA — input/skip/output projections, the
multistep update, and the scan carry all live outside the kernel.  The
round-5 per-NFE decomposition (BASELINE.md r5 table, runs/mfu_decompose)
measured that gap at ~70 us/NFE: 293 us in the stack kernel vs 364 us for
the complete production loop.  This kernel closes it by running the WHOLE
ladder — every denoiser evaluation of every sampler step plus the sampler
update — as one ``pallas_call`` with the sampler state ``x``, the
multistep history ring, and the running activation all resident in VMEM
scratch for the entire sampling trajectory.  Measured on the real chip:
280 us/NFE at 77.4% MFU vs the scan loop's 364 us at 59.6% (prod dims).
Per-NFE HBM traffic drops to the streamed weights and hoisted conditioner
blocks; x never leaves the chip between noise levels.

Uniform per-evaluation program: both samplers (parity targets
``models/diffusion.p_sample_plms_scan`` — reference diffusion.py:169-177,
271-296 — and ``p_sample_dpmpp_2m_scan``, including the optional
``sampler_clip_x0`` static thresholding) reduce to ONE program run once
per denoiser evaluation j = 0..J-1, with all scalars precomputed
host-side in float64 (:func:`plms_eval_tables` /
:func:`dpmpp_eval_tables`):

    eps    = Denoise(x_eval, t_eval[j])
    g      = clip(p[j]*x_eval + q[j]*eps)     x0 prediction (eps if p=0,q=1)
    f      = e0[j]*x_eval + e1[j]*g           history/combination operand
    n      = w0[j]*f + w1[j]*h0 + w2[j]*h1 + w3[j]*h2
    x_next = u[j]*x + v[j]*n
    x_eval <- x_next
    x      <- x_next if sel[j] else x         (PLMS j=0 keeps x: bootstrap)
    (h0,h1,h2) <- (f,h0,h1) if push[j] else unchanged

Instances:
- plain PLMS:  p=0, q=1, e0=0, e1=1 (f = eps); u = 1 + da*cx,
  v = -da*ce from the alphas_cumprod update; Adams–Bashforth order ramp
  1->4 in w*; the order-1 bootstrap is its own evaluation (sel=0, push=1)
  followed by the averaging evaluation (w = [.5,.5,0,0], push=0).
- PLMS + sampler_clip_x0: p = 1/a, q = -s/a (g = clipped x0 at t_eval),
  e0 = 1/s, e1 = -a/s (f = the rewritten eps'), everything else as PLMS —
  exactly the scan's clipped denoise_fn wrapper.
- dpmpp(2M):   p = 1/a_c, q = -s_c/a_c, e0=0, e1=1 (f = x0, optionally
  clipped); w0 = 1 + r/2, w1 = -r/2 (first step w0=1); u = s_n/s_c,
  v = -a_n*expm1(-h); final evaluation at t=0 returns the data prediction
  (u=0, v=1, w0=1).

Scalars are broadcast across the mel-bin lane dimension host-side
([J, NS, M]) so the kernel multiplies vectors, never extracts scalars
from VMEM.

Numerics match the scan paths by construction: sampler state and the
update stay float32 (the scans carry f32 x), matmuls run on the compute
dtype (bf16 on TPU) with f32 accumulation.  fp32 mode keeps the XLA scan
for the same reason as the stack kernel (Mosaic f32 dots are single-pass
bf16 — ``diffnet_stack.supported``); f32 is exercised in interpret mode
by tests, where dots are true f32.

Shape gates (:func:`supported_ladder`): B == 1, T % 128 == 0,
C % 128 == 0, M % 128 == 0 (44.1 kHz profile: M = 128 exactly),
dilations 2**(l % cycle) < T.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .diffnet_stack import PALLAS_OK, VMEM_LIMIT, _roll

if PALLAS_OK:  # pragma: no branch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

NS = 12  # scalar rows per eval: p q e0 e1 w0 w1 w2 w3 u v sel push


def supported_ladder(n_layers: int, cycle: int, t: int, c: int, m: int,
                     esize: int = 2,
                     vmem_budget: int = 64 * 2**20) -> bool:
    """Shape + VMEM-fit gate (mirrors ``diffnet_stack.supported``)."""
    if not (PALLAS_OK and c % 128 == 0 and t % 128 == 0 and m % 128 == 0
            and cycle >= 1 and n_layers % cycle == 0):
        return False
    if esize != 2:
        # fp32 sampling is the quality-reference mode; Mosaic would run
        # its dots as single-pass bf16 — keep the XLA scan there.
        return False
    if 2 ** (cycle - 1) >= t:
        return False
    streamed = 2 * (t * 2 * c + 3 * c * 2 * c + c * 2 * c) * esize
    consts = (m * c + c * c + c * m) * esize
    resident = 5 * t * m * 4 + t * c * esize + t * c * 4
    return streamed + consts + resident <= vmem_budget


def _ladder_kernel(xi_ref, scal_ref, sb_ref, cond_ref, win_ref, bin_ref,
                   wskip_ref, bskip_ref, wout_ref, bout_ref,
                   wd_ref, bd_ref, wo_ref, bo_ref, out_ref,
                   xs_ref, xe_ref, h0_ref, h1_ref, h2_ref, act_ref,
                   skip_ref, *, n_layers: int, cycle: int, t: int, c: int,
                   m: int, n_evals: int, clip_v: float):
    j = pl.program_id(0)
    l = pl.program_id(1)
    cdt = act_ref.dtype
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    @pl.when(jnp.logical_and(j == 0, l == 0))
    def _first():
        x0 = xi_ref[:]
        xs_ref[:] = x0
        xe_ref[:] = x0
        zero = jnp.zeros((t, m), jnp.float32)
        h0_ref[:] = zero
        h1_ref[:] = zero
        h2_ref[:] = zero

    @pl.when(l == 0)
    def _input_proj():
        # x = relu(conv1x1(input_projection, x_eval))  (diffnet.apply)
        xin = xe_ref[:].astype(cdt)
        a = jnp.dot(xin, win_ref[:], preferred_element_type=jnp.float32)
        a = a + bin_ref[0].astype(jnp.float32)
        act_ref[:] = jax.nn.relu(a).astype(cdt)
        skip_ref[:] = jnp.zeros((t, c), jnp.float32)

    # --- residual layer l (identical math to diffnet_stack._kernel) ---
    x = act_ref[:]
    y32 = x.astype(jnp.float32) + sb_ref[0, 0].astype(jnp.float32)
    y = y32.astype(cdt)
    row = jax.lax.broadcasted_iota(jnp.int32, (t, c), 0)

    def _taps(d):
        def f():
            yl = jnp.where(row >= d, _roll(y32, d), 0).astype(cdt)
            yr = jnp.where(row < t - d, _roll(y32, -d), 0).astype(cdt)
            return yl, yr
        return f

    yl, yr = jax.lax.switch(jax.lax.rem(l, cycle),
                            [_taps(2 ** i) for i in range(cycle)])
    w = wd_ref[0]  # [3, C, 2C]
    z = jnp.dot(yl, w[0], preferred_element_type=jnp.float32)
    z = z + jnp.dot(y, w[1], preferred_element_type=jnp.float32)
    z = z + jnp.dot(yr, w[2], preferred_element_type=jnp.float32)
    z = z + bd_ref[0, 0].astype(jnp.float32) + cond_ref[0].astype(jnp.float32)
    h = (jax.nn.sigmoid(z[:, :c]) * jnp.tanh(z[:, c:])).astype(cdt)
    o = jnp.dot(h, wo_ref[0], preferred_element_type=jnp.float32)
    o = o + bo_ref[0, 0].astype(jnp.float32)
    act_ref[:] = ((x.astype(jnp.float32) + o[:, :c]) * inv_sqrt2).astype(cdt)
    skip_ref[:] = skip_ref[:] + o[:, c:]

    @pl.when(l == n_layers - 1)
    def _epilogue():
        # skip/output projections (diffnet.apply tail) -> eps [T, M] f32
        sk = (skip_ref[:] * (1.0 / math.sqrt(n_layers))).astype(cdt)
        s1 = jnp.dot(sk, wskip_ref[:], preferred_element_type=jnp.float32)
        s1 = jax.nn.relu(s1 + bskip_ref[0].astype(jnp.float32)).astype(cdt)
        eps = jnp.dot(s1, wout_ref[:], preferred_element_type=jnp.float32)
        eps = eps + bout_ref[0].astype(jnp.float32)

        # per-eval scalars, broadcast across the M lane dim ([NS, M] rows)
        sc = scal_ref[0]
        p, q, e0, e1 = sc[0], sc[1], sc[2], sc[3]
        w0, w1, w2, w3 = sc[4], sc[5], sc[6], sc[7]
        u, v, sel, push = sc[8], sc[9], sc[10], sc[11]

        xe = xe_ref[:]
        g = p * xe + q * eps
        if clip_v > 0:  # static: sampler_clip_x0 thresholding in-kernel
            g = jnp.clip(g, -clip_v, clip_v)
        f = e0 * xe + e1 * g
        n = w0 * f + w1 * h0_ref[:] + w2 * h1_ref[:] + w3 * h2_ref[:]
        xcur = xs_ref[:]
        xn = u * xcur + v * n
        xe_ref[:] = xn
        xs_new = xcur + sel * (xn - xcur)
        xs_ref[:] = xs_new
        # history ring push (after n used the pre-push ring)
        h2_ref[:] = h2_ref[:] + push * (h1_ref[:] - h2_ref[:])
        h1_ref[:] = h1_ref[:] + push * (h0_ref[:] - h1_ref[:])
        h0_ref[:] = h0_ref[:] + push * (f - h0_ref[:])

        @pl.when(j == n_evals - 1)
        def _emit():
            out_ref[:] = xs_new


@functools.partial(jax.jit,
                   static_argnames=("cycle", "n_layers", "clip_v",
                                    "interpret"))
def plms_ladder(x_init, scal, sb_tab, cond_proj, win, bin_, wskip, bskip,
                wout, bout, wd, bd, wo, bo, *, cycle: int, n_layers: int,
                clip_v: float = 0.0, interpret: bool = False):
    """Run a full sampling ladder (PLMS or dpmpp, per the scalar tables).

    :param x_init:    [T, M] f32 initial noise (normed spec domain)
    :param scal:      [J, NS, M] f32 per-eval scalars broadcast over M
    :param sb_tab:    [J*L, 1, C] per-eval per-layer step bias (through
                      the step MLP + diffusion_projection, compute dtype)
    :param cond_proj: [L, T, 2C] hoisted conditioner projections
    :param win/bin_:  [M, C] / [1, C] input projection (k=1 conv)
    :param wskip/bskip: [C, C] / [1, C] skip projection
    :param wout/bout: [C, M] / [1, M] output projection
    :param wd/bd:     [L, 3, C, 2C] / [L, 1, 2C] dilated-conv weights
    :param wo/bo:     [L, C, 2C] / [L, 1, 2C] per-layer output 1x1
    :param clip_v:    static sampler_clip_x0 bound (0 = off)
    :returns:         [T, M] float32 final sampler state
    """
    n_evals = scal.shape[0]
    L, t, c2 = cond_proj.shape
    assert L == n_layers
    c = c2 // 2
    m = x_init.shape[1]
    assert x_init.shape == (t, m) and scal.shape == (n_evals, NS, m)
    assert sb_tab.shape == (n_evals * n_layers, 1, c), sb_tab.shape
    kernel = functools.partial(_ladder_kernel, n_layers=n_layers,
                               cycle=cycle, t=t, c=c, m=m, n_evals=n_evals,
                               clip_v=float(clip_v))
    return pl.pallas_call(
        kernel,
        grid=(n_evals, n_layers),
        in_specs=[
            pl.BlockSpec((t, m), lambda j, l: (0, 0)),            # x_init
            pl.BlockSpec((1, NS, m), lambda j, l: (j, 0, 0)),     # scal
            pl.BlockSpec((1, 1, c),
                         lambda j, l: (j * n_layers + l, 0, 0)),  # sb_tab
            pl.BlockSpec((1, t, 2 * c), lambda j, l: (l, 0, 0)),  # cond
            pl.BlockSpec((m, c), lambda j, l: (0, 0)),            # win
            pl.BlockSpec((1, c), lambda j, l: (0, 0)),            # bin
            pl.BlockSpec((c, c), lambda j, l: (0, 0)),            # wskip
            pl.BlockSpec((1, c), lambda j, l: (0, 0)),            # bskip
            pl.BlockSpec((c, m), lambda j, l: (0, 0)),            # wout
            pl.BlockSpec((1, m), lambda j, l: (0, 0)),            # bout
            pl.BlockSpec((1, 3, c, 2 * c),
                         lambda j, l: (l, 0, 0, 0)),              # wd
            pl.BlockSpec((1, 1, 2 * c), lambda j, l: (l, 0, 0)),  # bd
            pl.BlockSpec((1, c, 2 * c), lambda j, l: (l, 0, 0)),  # wo
            pl.BlockSpec((1, 1, 2 * c), lambda j, l: (l, 0, 0)),  # bo
        ],
        out_specs=pl.BlockSpec((t, m), lambda j, l: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, m), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t, m), jnp.float32),    # x (sampler state)
            pltpu.VMEM((t, m), jnp.float32),    # x_eval (denoiser input)
            pltpu.VMEM((t, m), jnp.float32),    # h0
            pltpu.VMEM((t, m), jnp.float32),    # h1
            pltpu.VMEM((t, m), jnp.float32),    # h2
            pltpu.VMEM((t, c), win.dtype),      # running activation
            pltpu.VMEM((t, c), jnp.float32),    # skip accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x_init, scal, sb_tab, cond_proj, win, bin_, wskip, bskip, wout, bout,
      wd, bd, wo, bo)


def _alpha_sigma(ac, t):
    """(sqrt(ac), sqrt(1-ac)) with the scan samplers' 1e-12 floors."""
    a = math.sqrt(max(float(ac[t]), 1e-24))
    s = max(math.sqrt(max(1.0 - float(ac[t]), 0.0)), 1e-12)
    return a, s


def _x0_rows(ac, t_eval, clip: bool):
    """(p, q, e0, e1) for one evaluation: plain eps passthrough when
    ``clip`` is off, else the clipped-x0 eps rewrite at ``t_eval`` —
    exactly the scan's sampler_clip_x0 denoise_fn wrapper."""
    if not clip:
        return 0.0, 1.0, 0.0, 1.0
    a, s = _alpha_sigma(ac, t_eval)
    return 1.0 / a, -s / a, 1.0 / s, -a / s


def plms_eval_tables(alphas_cumprod, t_start: int, interval: int, m: int,
                     clip: bool = False):
    """Host-side per-evaluation tables for the uniform ladder program.

    Returns (t_eval [J] int32 numpy, scal [J, NS, M] f32 numpy) for the
    reference PLMS grid ``reversed(range(0, t_start, interval))`` with the
    order-1 bootstrap expanded to its own evaluation (J = n_steps + 1).
    ``clip`` selects the sampler_clip_x0 rows (the kernel's static clip_v
    does the actual clamp).
    """
    import numpy as np

    ac = np.asarray(alphas_cumprod, np.float64)
    n_steps = max(-(-t_start // interval), 1)
    ts = (np.arange(n_steps - 1, -1, -1) * interval).astype(np.int64)

    def upd(t):
        # x' = x + da*(cx*x - ce*n)  ->  u = 1 + da*cx, v = -da*ce
        a_t = ac[t]
        a_prev = ac[max(t - interval, 0)]
        a_t_sq, a_prev_sq = math.sqrt(a_t), math.sqrt(a_prev)
        da = a_prev - a_t
        cx = 1.0 / (a_t_sq * (a_t_sq + a_prev_sq))
        ce = 1.0 / (a_t_sq * (math.sqrt((1 - a_prev) * a_t)
                              + math.sqrt((1 - a_t) * a_prev)))
        return 1.0 + da * cx, -da * ce

    orders = {1: (1.5, -0.5, 0.0, 0.0),
              2: (23 / 12, -16 / 12, 5 / 12, 0.0),
              3: (55 / 24, -59 / 24, 37 / 24, -9 / 24)}
    t_eval, rows = [], []
    # j=0: bootstrap eval at t0 -> x_pred only (sel=0), push f
    t0 = int(ts[0])
    t_eval.append(t0)
    rows.append(_x0_rows(ac, t0, clip) + (1.0, 0.0, 0.0, 0.0) + upd(t0)
                + (0.0, 1.0))
    # j=1: eval at t0_prev; update x at t0 with (f_a + f_b)/2; no push
    t_prev = max(t0 - interval, 0)
    t_eval.append(t_prev)
    rows.append(_x0_rows(ac, t_prev, clip) + (0.5, 0.5, 0.0, 0.0) + upd(t0)
                + (1.0, 0.0))
    # j>=2: steps k=1..n-1, order ramp 2->4
    for k in range(1, n_steps):
        tk = int(ts[k])
        t_eval.append(tk)
        w = orders[min(k, 3)]
        rows.append(_x0_rows(ac, tk, clip) + w + upd(tk) + (1.0, 1.0))
    scal = np.asarray(rows, np.float32)  # [J, NS]
    scal = np.repeat(scal[:, :, None], m, axis=2)  # broadcast over lanes
    return np.asarray(t_eval, np.int32), scal


def dpmpp_eval_tables(alphas_cumprod, t_start: int, interval: int, m: int,
                      grid: str = "lambda"):
    """Host-side tables for the DPM-Solver++(2M) ladder
    (parity: ``models/diffusion.p_sample_dpmpp_2m_scan``): evaluations at
    ``dpmpp_timesteps(...)[:-1]`` plus the final data-prediction
    evaluation at t=0 (J = len(ts)).  x0 clipping is the kernel's static
    clip_v (matching the scan's clipped denoise_fn, which clips the x0
    the sampler then exactly reconstructs)."""
    import numpy as np

    from ...models.diffusion import dpmpp_timesteps

    ac = np.asarray(alphas_cumprod, np.float64)
    ts = dpmpp_timesteps(ac, t_start, interval, grid)
    lam = 0.5 * (np.log(np.maximum(ac, 1e-24))
                 - np.log(np.maximum(1.0 - ac, 1e-24)))
    t_eval, rows = [], []
    h_prev = None
    for j in range(len(ts) - 1):
        t_cur, t_next = int(ts[j]), int(ts[j + 1])
        a_c, s_c = _alpha_sigma(ac, t_cur)
        a_n, s_n = _alpha_sigma(ac, t_next)
        h = float(lam[t_next] - lam[t_cur])
        if h_prev is None:
            w0, w1 = 1.0, 0.0
        else:
            r = h / h_prev
            w0, w1 = 1.0 + 0.5 * r, -0.5 * r
        h_prev = h
        t_eval.append(t_cur)
        rows.append((1.0 / a_c, -s_c / a_c, 0.0, 1.0,   # f = x0 (clipped)
                     w0, w1, 0.0, 0.0,
                     s_n / s_c, -a_n * math.expm1(-h), 1.0, 1.0))
    # final evaluation at t=0: return the data prediction there
    a_0, s_0 = _alpha_sigma(ac, 0)
    t_eval.append(0)
    rows.append((1.0 / a_0, -s_0 / a_0, 0.0, 1.0,
                 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.0))
    scal = np.asarray(rows, np.float32)  # [J, NS]
    scal = np.repeat(scal[:, :, None], m, axis=2)
    return np.asarray(t_eval, np.int32), scal
