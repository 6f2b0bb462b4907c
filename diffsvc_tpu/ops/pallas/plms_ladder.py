"""Pallas TPU kernel: the ENTIRE PLMS sampling ladder in one kernel.

Why: ``ops/pallas/diffnet_stack.residual_stack`` already fuses the 20
residual layers of one denoiser evaluation, but between evaluations the
sampler state still round-trips XLA — input/skip/output projections, the
PLMS Adams–Bashforth update, and the scan carry all live outside the
kernel.  The round-4 per-NFE decomposition (BASELINE.md r5 table,
runs/mfu_decompose) measured that gap at ~67 us/NFE: 301 us in the stack
kernel vs 368 us for the complete production loop.  This kernel closes
it by running the WHOLE ladder — every denoiser evaluation of every PLMS
step plus the sampler update — as one ``pallas_call`` with the sampler
state ``x``, the epsilon history ring, and the running activation all
resident in VMEM scratch for the entire sampling trajectory.  Per-NFE
HBM traffic drops to the streamed weights and hoisted conditioner
blocks; x never leaves the chip between noise levels.

Uniform per-evaluation formulation (parity with
``models/diffusion.p_sample_plms_scan``, reference diffusion.py:169-177
and 271-296): the reference's order-ramped PLMS runs n steps but n+1
denoiser evaluations (the first step bootstraps with a second evaluation
at ``x_pred``).  Indexing evaluations j = 0..n, every evaluation is the
same program:

    eps      = Denoise(x_eval, t_eval[j])
    noise'   = w0[j]*eps + w1[j]*h0 + w2[j]*h1 + w3[j]*h2
    x_next   = x + da[j] * (cx[j]*x - ce[j]*noise')
    x_eval  <- x_next
    x       <- x_next if sel[j] else x        (j=0 keeps x: bootstrap)
    (h0,h1,h2) <- (eps,h0,h1) if push[j] else unchanged  (j=1: no push)

with all scalars (da, cx, ce from the alphas_cumprod table; w* from the
Adams–Bashforth order ramp 1->4; sel/push flags) precomputed host-side
per evaluation — the order switch and the bootstrap's extra evaluation
disappear into table entries.  Scalars are broadcast across the mel-bin
lane dimension host-side ([J, NS, M]) so the kernel multiplies vectors,
never extracts scalars from VMEM.

Numerics match the scan path by construction: sampler state and the
PLMS update stay float32 (the scan carries f32 x), matmuls run on the
compute dtype (bf16 on TPU) with f32 accumulation.  fp32 mode keeps the
XLA scan for the same reason as the stack kernel (Mosaic f32 dots are
single-pass bf16 — ``diffnet_stack.supported``); f32 is exercised in
interpret mode by tests, where dots are true f32.

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

NS = 9  # scalar rows per eval: da cx ce w0 w1 w2 w3 sel push


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
                   m: int, n_evals: int):
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
        da, cx, ce = sc[0], sc[1], sc[2]
        w0, w1, w2, w3 = sc[3], sc[4], sc[5], sc[6]
        sel, push = sc[7], sc[8]

        nprime = w0 * eps + w1 * h0_ref[:] + w2 * h1_ref[:] + w3 * h2_ref[:]
        xcur = xs_ref[:]
        xn = xcur + da * (cx * xcur - ce * nprime)
        xe_ref[:] = xn
        xs_new = xcur + sel * (xn - xcur)
        xs_ref[:] = xs_new
        # history ring push (after noise' used the pre-push ring)
        h2_ref[:] = h2_ref[:] + push * (h1_ref[:] - h2_ref[:])
        h1_ref[:] = h1_ref[:] + push * (h0_ref[:] - h1_ref[:])
        h0_ref[:] = h0_ref[:] + push * (eps - h0_ref[:])

        @pl.when(j == n_evals - 1)
        def _emit():
            out_ref[:] = xs_new


@functools.partial(jax.jit,
                   static_argnames=("cycle", "n_layers", "interpret"))
def plms_ladder(x_init, scal, sb_tab, cond_proj, win, bin_, wskip, bskip,
                wout, bout, wd, bd, wo, bo, *, cycle: int, n_layers: int,
                interpret: bool = False):
    """Run the full PLMS sampling ladder.

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
                               cycle=cycle, t=t, c=c, m=m, n_evals=n_evals)
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


def plms_eval_tables(alphas_cumprod, t_start: int, interval: int, m: int):
    """Host-side per-evaluation tables for the uniform ladder program.

    Returns (t_eval [J] int32 numpy, scal [J, NS, M] f32 numpy) for the
    reference PLMS grid ``reversed(range(0, t_start, interval))`` with the
    order-1 bootstrap expanded to its own evaluation (J = n_steps + 1).
    """
    import numpy as np

    ac = np.asarray(alphas_cumprod, np.float64)
    n_steps = max(-(-t_start // interval), 1)
    ts = (np.arange(n_steps - 1, -1, -1) * interval).astype(np.int64)

    def upd(t):
        a_t = ac[t]
        a_prev = ac[max(t - interval, 0)]
        a_t_sq, a_prev_sq = math.sqrt(a_t), math.sqrt(a_prev)
        da = a_prev - a_t
        cx = 1.0 / (a_t_sq * (a_t_sq + a_prev_sq))
        ce = 1.0 / (a_t_sq * (math.sqrt((1 - a_prev) * a_t)
                              + math.sqrt((1 - a_t) * a_prev)))
        return da, cx, ce

    orders = {1: (1.5, -0.5, 0.0, 0.0),
              2: (23 / 12, -16 / 12, 5 / 12, 0.0),
              3: (55 / 24, -59 / 24, 37 / 24, -9 / 24)}
    t_eval, rows = [], []
    # j=0: bootstrap eval at t0 -> x_pred only (sel=0), push eps
    t0 = int(ts[0])
    t_eval.append(t0)
    rows.append(upd(t0) + (1.0, 0.0, 0.0, 0.0, 0.0, 1.0))
    # j=1: eval at t0_prev; update x at t0 with (eps_a + eps_b)/2; no push
    t_eval.append(max(t0 - interval, 0))
    rows.append(upd(t0) + (0.5, 0.5, 0.0, 0.0, 1.0, 0.0))
    # j>=2: steps k=1..n-1, order ramp 2->4
    for k in range(1, n_steps):
        tk = int(ts[k])
        t_eval.append(tk)
        w = orders[min(k, 3)]
        rows.append(upd(tk) + w + (1.0, 1.0))
    scal = np.asarray(rows, np.float32)  # [J, NS]
    scal = np.repeat(scal[:, :, None], m, axis=2)  # broadcast over lanes
    return np.asarray(t_eval, np.int32), scal
