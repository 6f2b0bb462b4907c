"""Pallas TPU kernel: the full DiffNet residual stack in ONE pass.

Why: during sampling the denoiser runs 50+ times; in the XLA path every
residual layer writes its [T, 2C] intermediates back to HBM (~8 MB/layer),
so a step is HBM-traffic bound at ~6x the weight-streaming floor.  This
kernel keeps the running activation ``x`` and the skip accumulator resident
in VMEM scratch across all layers (grid = one program per layer, sequential
on TPU) while each layer's weights and hoisted conditioner block stream
from HBM with pallas' automatic double buffering.  Per-step HBM traffic
drops to the weights themselves (~75 MB bf16 at production dims), the
matmuls ride the MXU, and the gate/residual element-wise work happens in
VMEM.

Layer math (parity with models/diffnet._residual_block, reference
``network/diff/net.py:24-57``):

    y     = x + step_bias[l]                       (per-layer FiLM add)
    z     = dilated_conv3(y) + cond_proj[l]        (3 shifted MXU matmuls)
    h     = sigmoid(z[:, :C]) * tanh(z[:, C:])
    o     = h @ W_out[l] + b_out[l]
    x'    = (x + o[:, :C]) / sqrt(2)
    skip += o[:, C:]

The kernel returns sum(skip); input/skip/output projections and the step
MLP stay in XLA (three small matmuls per step).

Shape gates (checked by :func:`supported`): B == 1, C % 128 == 0,
T % 128 == 0, dilations = 2**(l % cycle).  fp32 and bf16 activations are
both supported; accumulation is always fp32 (``preferred_element_type``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

try:  # pallas requires a TPU-capable lowering; import lazily
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_OK = True
except Exception:  # pragma: no cover
    PALLAS_OK = False


def _roll(x, shift: int):
    """Circular shift along axis 0 (static shift; out[i] = x[i - shift]).
    pltpu.roll requires a non-negative shift, so negative shifts wrap."""
    try:
        return pltpu.roll(x, shift=shift % x.shape[0], axis=0)
    except Exception:  # interpret mode on CPU has no TPU lowering
        return jnp.roll(x, shift, axis=0)


VMEM_LIMIT = 100 * 2**20  # v5e/v5p have 128 MB VMEM; leave headroom


def supported(n_layers: int, cycle: int, t: int, c: int, batch: int,
              esize: int = 2, vmem_budget: int = 64 * 2**20) -> bool:
    """Shape + VMEM-fit gate (the pallas_call asks Mosaic for
    ``VMEM_LIMIT``; the budget leaves margin for spills/temporaries).
    At production dims (T=896, C=384) both bf16 (~17 MB) and fp32
    (~29 MB with temporaries) fit."""
    if not (PALLAS_OK and batch == 1 and c % 128 == 0 and t % 128 == 0
            and cycle >= 1 and n_layers % cycle == 0):
        return False
    if esize != 2:
        # Mosaic lowers jnp.dot on f32 inputs as a single bf16 MXU pass, so
        # an fp32 kernel would silently be bf16-accurate; fp32 sampling
        # (the quality-reference mode) keeps the XLA scan instead.
        return False
    if 2 ** (cycle - 1) >= t:
        return False
    streamed = 2 * (t * 2 * c + 3 * c * 2 * c + c * 2 * c) * esize  # dbl-buf
    resident = t * c * esize * 2 + 2 * t * c * 4
    return streamed + resident <= vmem_budget


def _kernel(x0_ref, sb_ref, cond_ref, wd_ref, bd_ref, wo_ref, bo_ref,
            out_ref, x_ref, skip_ref, *, n_layers: int, cycle: int,
            t: int, c: int):
    l = pl.program_id(0)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    @pl.when(l == 0)
    def _init():
        x_ref[:] = x0_ref[:]
        skip_ref[:] = jnp.zeros((t, c), jnp.float32)

    x = x_ref[:]
    y32 = x.astype(jnp.float32) + sb_ref[0, 0].astype(jnp.float32)
    y = y32.astype(x.dtype)

    # Shifted taps y[t -/+ d] via value-level rolls with STATIC per-branch
    # dilations (Mosaic cannot prove dynamic sublane-slice alignment, and
    # roll has a native TPU lowering — 32-bit only, so roll the fp32 copy);
    # rows rolled in from the far end are zeroed to match conv SAME padding.
    row = jax.lax.broadcasted_iota(jnp.int32, (t, c), 0)

    def _taps(d):
        def f():
            yl = jnp.where(row >= d, _roll(y32, d), 0).astype(x.dtype)
            yr = jnp.where(row < t - d, _roll(y32, -d), 0).astype(x.dtype)
            return yl, yr
        return f

    yl, yr = jax.lax.switch(jax.lax.rem(l, cycle),
                            [_taps(2 ** j) for j in range(cycle)])
    w = wd_ref[0]  # [3, C, 2C]
    z = jnp.dot(yl, w[0], preferred_element_type=jnp.float32)
    z = z + jnp.dot(y, w[1], preferred_element_type=jnp.float32)
    z = z + jnp.dot(yr, w[2], preferred_element_type=jnp.float32)
    z = z + bd_ref[0, 0].astype(jnp.float32) + cond_ref[0].astype(jnp.float32)
    h = (jax.nn.sigmoid(z[:, :c]) * jnp.tanh(z[:, c:])).astype(x.dtype)
    o = jnp.dot(h, wo_ref[0], preferred_element_type=jnp.float32)
    o = o + bo_ref[0, 0].astype(jnp.float32)
    x_ref[:] = ((x.astype(jnp.float32) + o[:, :c]) * inv_sqrt2).astype(x.dtype)
    skip_ref[:] = skip_ref[:] + o[:, c:]

    @pl.when(l == n_layers - 1)
    def _emit():
        out_ref[:] = skip_ref[:]


@functools.partial(jax.jit, static_argnames=("cycle", "interpret"))
def residual_stack(x0, step_bias, cond_proj, wd, bd, wo, bo, *,
                   cycle: int, interpret: bool = False):
    """Run the full residual stack.

    :param x0:        [T, C] activations after input projection + relu
    :param step_bias: [L, C] per-layer diffusion-step bias (already through
                      the step MLP and each layer's diffusion_projection)
    :param cond_proj: [L, T, 2C] hoisted conditioner projections
    :param wd/bd:     [L, 3, C, 2C] / [L, 2C] dilated-conv weights
    :param wo/bo:     [L, C, 2C] / [L, 2C] output 1x1 weights
    :returns:         [T, C] float32 skip sum (caller scales by 1/sqrt(L))
    """
    n_layers, t, c2 = cond_proj.shape
    c = c2 // 2
    assert x0.shape == (t, c), (x0.shape, (t, c))
    # TPU block tiling: the last two dims of every block must be (8k, 128k)
    # or equal the array dims — lift 2-D biases to [L, 1, .] so the (1, .)
    # trailing block equals the array's trailing dims
    step_bias = step_bias[:, None, :]
    bd = bd[:, None, :]
    bo = bo[:, None, :]
    kernel = functools.partial(_kernel, n_layers=n_layers, cycle=cycle,
                               t=t, c=c)
    return pl.pallas_call(
        kernel,
        grid=(n_layers,),
        in_specs=[
            pl.BlockSpec((t, c), lambda l: (0, 0)),              # x0
            pl.BlockSpec((1, 1, c), lambda l: (l, 0, 0)),        # step_bias
            pl.BlockSpec((1, t, 2 * c), lambda l: (l, 0, 0)),    # cond_proj
            pl.BlockSpec((1, 3, c, 2 * c), lambda l: (l, 0, 0, 0)),  # wd
            pl.BlockSpec((1, 1, 2 * c), lambda l: (l, 0, 0)),     # bd
            pl.BlockSpec((1, c, 2 * c), lambda l: (l, 0, 0)),    # wo
            pl.BlockSpec((1, 1, 2 * c), lambda l: (l, 0, 0)),     # bo
        ],
        out_specs=pl.BlockSpec((t, c), lambda l: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t, c), x0.dtype),                 # x (residual state)
            pltpu.VMEM((t, c), jnp.float32),              # skip accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x0, step_bias, cond_proj, wd, bd, wo, bo)


# ---------------------------------------------------------------------------
# Training: forward that saves per-layer inputs + a full backward kernel,
# packaged as a jax.custom_vjp.  No reference counterpart (the reference
# trains through torch autograd); math parity with the scan path is tested
# in tests/test_diffnet_stack_train.py.
# ---------------------------------------------------------------------------

def _fwd_kernel(x0_ref, sb_ref, cond_ref, wd_ref, bd_ref, wo_ref, bo_ref,
                out_ref, xsave_ref, x_ref, skip_ref, *, n_layers: int,
                cycle: int, t: int, c: int):
    """Inference kernel + an [L, T, C] stack of each layer's input x_l
    (the only residual needed: z/gates are recomputed in the backward).

    Matmul operands take the dtype of the streamed weights (``wd_ref``):
    Mosaic's MXU rounds f32 operands to bf16 anyway, so streaming the
    weights/conditioner as bf16 halves their HBM traffic at identical
    matmul numerics; the carried residual state stays in ``x0``'s dtype."""
    l = pl.program_id(0)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    cd = wd_ref.dtype  # compute/stream dtype for the MXU operands

    @pl.when(l == 0)
    def _init():
        x_ref[:] = x0_ref[:]
        skip_ref[:] = jnp.zeros((t, c), jnp.float32)

    x = x_ref[:]
    xsave_ref[0] = x.astype(xsave_ref.dtype)
    y32 = x.astype(jnp.float32) + sb_ref[0, 0].astype(jnp.float32)
    y = y32.astype(cd)
    row = jax.lax.broadcasted_iota(jnp.int32, (t, c), 0)

    def _taps(d):
        def f():
            yl = jnp.where(row >= d, _roll(y32, d), 0).astype(cd)
            yr = jnp.where(row < t - d, _roll(y32, -d), 0).astype(cd)
            return yl, yr
        return f

    yl, yr = jax.lax.switch(jax.lax.rem(l, cycle),
                            [_taps(2 ** j) for j in range(cycle)])
    w = wd_ref[0]
    z = jnp.dot(yl, w[0], preferred_element_type=jnp.float32)
    z = z + jnp.dot(y, w[1], preferred_element_type=jnp.float32)
    z = z + jnp.dot(yr, w[2], preferred_element_type=jnp.float32)
    z = z + bd_ref[0, 0].astype(jnp.float32) + cond_ref[0].astype(jnp.float32)
    h = (jax.nn.sigmoid(z[:, :c]) * jnp.tanh(z[:, c:])).astype(cd)
    o = jnp.dot(h, wo_ref[0], preferred_element_type=jnp.float32)
    o = o + bo_ref[0, 0].astype(jnp.float32)
    x_ref[:] = ((x.astype(jnp.float32) + o[:, :c]) * inv_sqrt2).astype(x.dtype)
    skip_ref[:] = skip_ref[:] + o[:, c:]

    @pl.when(l == n_layers - 1)
    def _emit():
        out_ref[:] = skip_ref[:]


def _bwd_kernel(xs_ref, sb_ref, cond_ref, wd_ref, bd_ref, wo_ref, bo_ref,
                dout_ref,
                dx0_ref, dsb_ref, dcp_ref, dwd_ref, dbd_ref, dwo_ref,
                dbo_ref, dx_state, *, n_layers: int, cycle: int, t: int,
                c: int):
    """Reverse pass over layers (grid step i visits layer l = L-1-i).

    Recomputes y/z/gates from the saved x_l, then:
        do  = [dx_next/sqrt2 | dout]          (residual half, skip half)
        dh  = do @ Wo^T;  dWo = h^T do;  dbo = sum do
        dg  = dh * s(1-s)tf;  df = dh * s(1-tf^2);  dz = [dg | df]
        dcp = dz;  dbd = sum dz;  dW[j] = y_shift(j)^T dz
        dy  = sum_j shiftback_j(dz) @ W[j]^T
        dsb = sum dy;  dx = dy + dx_next/sqrt2
    """
    i = pl.program_id(0)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    @pl.when(i == 0)
    def _init():
        dx_state[:] = jnp.zeros((t, c), jnp.float32)

    x = xs_ref[0]
    y32 = x.astype(jnp.float32) + sb_ref[0, 0].astype(jnp.float32)
    y = y32.astype(x.dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, (t, c), 0)
    # layer index l = L-1-i; dilation = 2 ** (l % cycle)
    l = n_layers - 1 - i

    def _taps(d):
        def f():
            yl = jnp.where(row >= d, _roll(y32, d), 0).astype(x.dtype)
            yr = jnp.where(row < t - d, _roll(y32, -d), 0).astype(x.dtype)
            return yl, yr
        return f

    yl, yr = jax.lax.switch(jax.lax.rem(l, cycle),
                            [_taps(2 ** j) for j in range(cycle)])
    w = wd_ref[0]
    z = jnp.dot(yl, w[0], preferred_element_type=jnp.float32)
    z = z + jnp.dot(y, w[1], preferred_element_type=jnp.float32)
    z = z + jnp.dot(yr, w[2], preferred_element_type=jnp.float32)
    z = z + bd_ref[0, 0].astype(jnp.float32) + cond_ref[0].astype(jnp.float32)
    s = jax.nn.sigmoid(z[:, :c])
    tf = jnp.tanh(z[:, c:])
    h = (s * tf).astype(x.dtype)

    dx_next = dx_state[:]
    do = jnp.concatenate([dx_next * inv_sqrt2,
                          dout_ref[:].astype(jnp.float32)], axis=1)
    do_c = do.astype(x.dtype)
    # dWo = h^T @ do: contraction over T (rows)
    dwo_ref[0] = jax.lax.dot_general(
        h, do_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbo_ref[0, 0] = do.sum(axis=0)
    dh = jnp.dot(do_c, wo_ref[0].T, preferred_element_type=jnp.float32)
    dg = dh * s * (1.0 - s) * tf
    df = dh * s * (1.0 - tf * tf)
    dz = jnp.concatenate([dg, df], axis=1)
    dz_c = dz.astype(x.dtype)
    dcp_ref[0] = dz
    dbd_ref[0, 0] = dz.sum(axis=0)

    # dW[j] = y_shift(j)^T @ dz  for shifts (-d, 0, +d)
    dw0 = jax.lax.dot_general(yl, dz_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw1 = jax.lax.dot_general(y, dz_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(yr, dz_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dwd_ref[0] = jnp.stack([dw0, dw1, dw2])

    # dy[t] = sum_j dz[t - off_j] W[j]^T with zeroing at the true edges:
    # shift dz the opposite way and mask rows whose source fell outside
    # (dz is [T, 2C] -> its own 2C-wide row iota)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * c), 0)

    def _btaps2(d):
        def f():
            zl = jnp.where(row2 < t - d, _roll(dz, -d), 0).astype(x.dtype)
            zr = jnp.where(row2 >= d, _roll(dz, d), 0).astype(x.dtype)
            return zl, zr
        return f

    zl, zr = jax.lax.switch(jax.lax.rem(l, cycle),
                            [_btaps2(2 ** j) for j in range(cycle)])
    dy = jnp.dot(zl, w[0].T, preferred_element_type=jnp.float32)
    dy = dy + jnp.dot(dz_c, w[1].T, preferred_element_type=jnp.float32)
    dy = dy + jnp.dot(zr, w[2].T, preferred_element_type=jnp.float32)

    dsb_ref[0, 0] = dy.sum(axis=0)
    dx = dy + dx_next * inv_sqrt2
    dx_state[:] = dx

    @pl.when(i == n_layers - 1)
    def _emit():
        dx0_ref[:] = dx


def _stack_args(step_bias, bd, bo):
    return step_bias[:, None, :], bd[:, None, :], bo[:, None, :]


def _call_fwd(x0, step_bias, cond_proj, wd, bd, wo, bo, *, cycle: int,
              interpret: bool, save_dtype=None):
    n_layers, t, c2 = cond_proj.shape
    c = c2 // 2
    if save_dtype is None:
        save_dtype = x0.dtype
    sb, bdl, bol = _stack_args(step_bias, bd, bo)
    kernel = functools.partial(_fwd_kernel, n_layers=n_layers, cycle=cycle,
                               t=t, c=c)
    return pl.pallas_call(
        kernel,
        grid=(n_layers,),
        in_specs=[
            pl.BlockSpec((t, c), lambda l: (0, 0)),
            pl.BlockSpec((1, 1, c), lambda l: (l, 0, 0)),
            pl.BlockSpec((1, t, 2 * c), lambda l: (l, 0, 0)),
            pl.BlockSpec((1, 3, c, 2 * c), lambda l: (l, 0, 0, 0)),
            pl.BlockSpec((1, 1, 2 * c), lambda l: (l, 0, 0)),
            pl.BlockSpec((1, c, 2 * c), lambda l: (l, 0, 0)),
            pl.BlockSpec((1, 1, 2 * c), lambda l: (l, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((t, c), lambda l: (0, 0)),
            pl.BlockSpec((1, t, c), lambda l: (l, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, t, c), save_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((t, c), x0.dtype),
            pltpu.VMEM((t, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x0, sb, cond_proj, wd, bdl, wo, bol)


def _call_bwd(xsave, step_bias, cond_proj, wd, bd, wo, bo, dout, *,
              cycle: int, interpret: bool):
    n_layers, t, c2 = cond_proj.shape
    c = c2 // 2
    sb, bdl, bol = _stack_args(step_bias, bd, bo)
    kernel = functools.partial(_bwd_kernel, n_layers=n_layers, cycle=cycle,
                               t=t, c=c)
    rev = lambda l: (n_layers - 1 - l, 0, 0)
    rev4 = lambda l: (n_layers - 1 - l, 0, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(n_layers,),
        in_specs=[
            pl.BlockSpec((1, t, c), rev),                 # xsave
            pl.BlockSpec((1, 1, c), rev),                 # step_bias
            pl.BlockSpec((1, t, 2 * c), rev),             # cond_proj
            pl.BlockSpec((1, 3, c, 2 * c), rev4),         # wd
            pl.BlockSpec((1, 1, 2 * c), rev),             # bd
            pl.BlockSpec((1, c, 2 * c), rev),             # wo
            pl.BlockSpec((1, 1, 2 * c), rev),             # bo
            pl.BlockSpec((t, c), lambda l: (0, 0)),       # dout
        ],
        out_specs=[
            pl.BlockSpec((t, c), lambda l: (0, 0)),       # dx0
            pl.BlockSpec((1, 1, c), rev),                 # dsb
            pl.BlockSpec((1, t, 2 * c), rev),             # dcp
            pl.BlockSpec((1, 3, c, 2 * c), rev4),         # dwd
            pl.BlockSpec((1, 1, 2 * c), rev),             # dbd
            pl.BlockSpec((1, c, 2 * c), rev),             # dwo
            pl.BlockSpec((1, 1, 2 * c), rev),             # dbo
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, t, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, 3, c, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, 1, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, 1, 2 * c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((t, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xsave, sb, cond_proj, wd, bdl, wo, bol, dout)


def supported_train(n_layers: int, cycle: int, t: int, c: int,
                    vmem_budget: int = 64 * 2**20) -> bool:
    """Training variant gate: fp32 buffers are ALLOWED (Mosaic's f32 dots
    are single-pass bf16-operand/f32-accumulate — exactly XLA's default
    matmul precision for training, so numerics match the scan path to
    default-precision accuracy, not bit-exactly)."""
    if not (PALLAS_OK and c % 128 == 0 and t % 128 == 0 and cycle >= 1
            and n_layers % cycle == 0):
        return False
    if 2 ** (cycle - 1) >= t:
        return False
    streamed = 2 * (t * 2 * c + 3 * c * 2 * c + c * 2 * c) * 4
    resident = 8 * t * c * 4 + 2 * t * 2 * c * 4
    return streamed + resident <= vmem_budget


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def residual_stack_train(x0, step_bias, cond_proj, wd, bd, wo, bo,
                         cycle: int, interpret: bool = False):
    """Differentiable fused residual stack (single sample [T, C]; vmap over
    the batch axis adds a leading grid dimension).  Forward saves each
    layer's input x_l; backward recomputes gates and emits all grads in one
    reverse-order kernel.

    The undifferentiated primal (validation/eval losses) reuses the
    inference kernel — no [L, T, C] residual stack is streamed to HBM
    when no backward pass will consume it."""
    return residual_stack(x0, step_bias, cond_proj, wd, bd, wo, bo,
                          cycle=cycle, interpret=interpret)


def _rst_fwd(x0, step_bias, cond_proj, wd, bd, wo, bo, cycle, interpret):
    out, xsave = _call_fwd(x0, step_bias, cond_proj, wd, bd, wo, bo,
                           cycle=cycle, interpret=interpret)
    return out, (xsave, step_bias, cond_proj, wd, bd, wo, bo)


def _rst_bwd(cycle, interpret, res, dout):
    xsave, step_bias, cond_proj, wd, bd, wo, bo = res
    dx0, dsb, dcp, dwd, dbd, dwo, dbo = _call_bwd(
        xsave, step_bias, cond_proj, wd, bd, wo, bo,
        dout.astype(jnp.float32), cycle=cycle, interpret=interpret)
    return (dx0.astype(x0_dtype(xsave)), dsb[:, 0].astype(step_bias.dtype),
            dcp.astype(cond_proj.dtype), dwd.astype(wd.dtype),
            dbd[:, 0].astype(bd.dtype), dwo.astype(wo.dtype),
            dbo[:, 0].astype(bo.dtype))


def x0_dtype(xsave):
    return xsave.dtype


residual_stack_train.defvjp(_rst_fwd, _rst_bwd)


# ---------------------------------------------------------------------------
# Batch-fused training backward.  The vmapped per-sample backward above
# re-streams every layer's weights once PER SAMPLE (~2.3 GB/step at B=24
# prod dims) and emits per-sample weight grads ([B, L, 3, C, 2C] ~ 1.7 GB)
# that XLA then batch-sums — measured 44 ms against an 11.8 ms compute
# floor (runs/train_decompose).  This variant runs ONE kernel over a
# (layer, batch) grid with the batch innermost:
#   * weight blocks are indexed by layer only, so Mosaic fetches them once
#     per layer and reuses them across the whole batch;
#   * weight/bias grads accumulate IN the revisited output block (init at
#     b == 0, += after; the block flushes when the layer index changes),
#     so only the final [L, ...] grads ever touch HBM;
#   * the per-sample reverse-mode carry dx lives in a [B, T, C] f32 VMEM
#     scratch (the gate checks it fits);
#   * activations/weights stream in ``stream_dtype`` (bf16 by default —
#     identical matmul numerics, half the traffic; "f32" restores the
#     exact legacy numerics for tight parity tests).
# ---------------------------------------------------------------------------

def _bwd_kernel_b(xs_ref, sb_ref, cond_ref, wd_ref, bd_ref, wo_ref, bo_ref,
                  dout_ref,
                  dx0_ref, dsb_ref, dcp_ref, dwd_ref, dbd_ref, dwo_ref,
                  dbo_ref, dx_state, *, n_layers: int, n_batch: int,
                  cycle: int, t: int, c: int):
    """Grid (i, b): i walks layers in reverse (l = L-1-i), b is the sample."""
    i = pl.program_id(0)
    b = pl.program_id(1)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    cd = wd_ref.dtype

    @pl.when(i == 0)
    def _init():
        dx_state[pl.ds(b, 1)] = jnp.zeros((1, t, c), jnp.float32)

    x = xs_ref[0, 0]
    y32 = x.astype(jnp.float32) + sb_ref[0, 0, 0].astype(jnp.float32)
    y = y32.astype(cd)
    row = jax.lax.broadcasted_iota(jnp.int32, (t, c), 0)
    l = n_layers - 1 - i

    def _taps(d):
        def f():
            yl = jnp.where(row >= d, _roll(y32, d), 0).astype(cd)
            yr = jnp.where(row < t - d, _roll(y32, -d), 0).astype(cd)
            return yl, yr
        return f

    yl, yr = jax.lax.switch(jax.lax.rem(l, cycle),
                            [_taps(2 ** j) for j in range(cycle)])
    w = wd_ref[0]
    z = jnp.dot(yl, w[0], preferred_element_type=jnp.float32)
    z = z + jnp.dot(y, w[1], preferred_element_type=jnp.float32)
    z = z + jnp.dot(yr, w[2], preferred_element_type=jnp.float32)
    z = z + bd_ref[0, 0].astype(jnp.float32) + cond_ref[0, 0].astype(jnp.float32)
    s = jax.nn.sigmoid(z[:, :c])
    tf = jnp.tanh(z[:, c:])
    h = (s * tf).astype(cd)

    dx_next = dx_state[pl.ds(b, 1)][0]
    do = jnp.concatenate([dx_next * inv_sqrt2,
                          dout_ref[0].astype(jnp.float32)], axis=1)
    do_c = do.astype(cd)
    dwo = jax.lax.dot_general(h, do_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbo = do.sum(axis=0)

    @pl.when(b == 0)
    def _wo_init():
        dwo_ref[0] = dwo
        dbo_ref[0, 0] = dbo

    @pl.when(b > 0)
    def _wo_acc():
        dwo_ref[0] = dwo_ref[0] + dwo
        dbo_ref[0, 0] = dbo_ref[0, 0] + dbo

    dh = jnp.dot(do_c, wo_ref[0].T, preferred_element_type=jnp.float32)
    dg = dh * s * (1.0 - s) * tf
    df = dh * s * (1.0 - tf * tf)
    dz = jnp.concatenate([dg, df], axis=1)
    dz_c = dz.astype(cd)
    dcp_ref[0, 0] = dz.astype(dcp_ref.dtype)
    dbd = dz.sum(axis=0)

    dw0 = jax.lax.dot_general(yl, dz_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw1 = jax.lax.dot_general(y, dz_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(yr, dz_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dwd = jnp.stack([dw0, dw1, dw2])

    @pl.when(b == 0)
    def _wd_init():
        dwd_ref[0] = dwd
        dbd_ref[0, 0] = dbd

    @pl.when(b > 0)
    def _wd_acc():
        dwd_ref[0] = dwd_ref[0] + dwd
        dbd_ref[0, 0] = dbd_ref[0, 0] + dbd

    row2 = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * c), 0)

    def _btaps2(d):
        def f():
            zl = jnp.where(row2 < t - d, _roll(dz, -d), 0).astype(cd)
            zr = jnp.where(row2 >= d, _roll(dz, d), 0).astype(cd)
            return zl, zr
        return f

    zl, zr = jax.lax.switch(jax.lax.rem(l, cycle),
                            [_btaps2(2 ** j) for j in range(cycle)])
    dy = jnp.dot(zl, w[0].T, preferred_element_type=jnp.float32)
    dy = dy + jnp.dot(dz_c, w[1].T, preferred_element_type=jnp.float32)
    dy = dy + jnp.dot(zr, w[2].T, preferred_element_type=jnp.float32)

    dsb_ref[0, 0, 0] = dy.sum(axis=0)
    dx = dy + dx_next * inv_sqrt2
    dx_state[pl.ds(b, 1)] = dx[None]
    # the (b) output block flushes every step; the last visit (i = L-1)
    # lands last in HBM, so writing the running carry each time is correct
    dx0_ref[0] = dx


def _call_bwd_batched(xsave, step_bias, cond_proj, wd, bd, wo, bo, dout, *,
                      cycle: int, interpret: bool):
    """xsave [B, L, T, C]; step_bias [L, B, C]; cond_proj [L, B, T, 2C];
    dout [B, T, C] (already in the stream dtype).  Returns
    (dx0 [B,T,C] f32, dsb [L,B,C] f32, dcp [L,B,T,2C] stream-dtype,
    dwd/dbd/dwo/dbo batch-summed f32)."""
    n_layers, n_batch, t, c2 = cond_proj.shape
    c = c2 // 2
    sb = step_bias[:, :, None, :]                       # [L, B, 1, C]
    bdl = bd[:, None, :]
    bol = bo[:, None, :]
    kernel = functools.partial(_bwd_kernel_b, n_layers=n_layers,
                               n_batch=n_batch, cycle=cycle, t=t, c=c)
    rev = lambda i, b: (n_layers - 1 - i, b, 0, 0)
    revw = lambda i, b: (n_layers - 1 - i, 0, 0, 0)
    rev3 = lambda i, b: (n_layers - 1 - i, 0, 0)
    bidx = lambda i, b: (b, 0, 0)
    dx0, dsb, dcp, dwd, dbd, dwo, dbo = pl.pallas_call(
        kernel,
        grid=(n_layers, n_batch),
        in_specs=[
            pl.BlockSpec((1, 1, t, c), lambda i, b: (b, n_layers - 1 - i, 0, 0)),  # xsave
            pl.BlockSpec((1, 1, 1, c), rev),              # step_bias
            pl.BlockSpec((1, 1, t, 2 * c), rev),          # cond_proj
            pl.BlockSpec((1, 3, c, 2 * c), revw),         # wd
            pl.BlockSpec((1, 1, 2 * c), rev3),            # bd
            pl.BlockSpec((1, c, 2 * c), rev3),            # wo
            pl.BlockSpec((1, 1, 2 * c), rev3),            # bo
            pl.BlockSpec((1, t, c), bidx),                # dout
        ],
        out_specs=[
            pl.BlockSpec((1, t, c), bidx),                # dx0
            pl.BlockSpec((1, 1, 1, c), rev),              # dsb
            pl.BlockSpec((1, 1, t, 2 * c), rev),          # dcp
            pl.BlockSpec((1, 3, c, 2 * c), revw),         # dwd (accum over b)
            pl.BlockSpec((1, 1, 2 * c), rev3),            # dbd (accum over b)
            pl.BlockSpec((1, c, 2 * c), rev3),            # dwo (accum over b)
            pl.BlockSpec((1, 1, 2 * c), rev3),            # dbo (accum over b)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_batch, t, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, n_batch, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, n_batch, t, 2 * c), cond_proj.dtype),
            jax.ShapeDtypeStruct((n_layers, 3, c, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, 1, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, 1, 2 * c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((n_batch, t, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xsave, sb, cond_proj, wd, bdl, wo, bol, dout)
    return dx0, dsb[:, :, 0], dcp, dwd, dbd[:, 0], dwo, dbo[:, 0]


def supported_train_batched(n_layers: int, cycle: int, t: int, c: int,
                            batch: int, stream_esize: int = 2,
                            vmem_budget: int = 60 * 2**20) -> bool:
    """Gate for the batch-fused backward: standard shape rules plus the
    [B, T, C] f32 dx carry must fit VMEM next to the double-buffered
    streams.  Mosaic's stack temporaries for this kernel measured ~30 MB
    at prod dims (an f32-stream B=24 ask of 71 MB by this accounting
    actually allocated 100.5 MB), so the budget leaves 40 MB of the
    100 MB ``VMEM_LIMIT`` for them."""
    if not (PALLAS_OK and batch >= 1 and c % 128 == 0 and t % 128 == 0
            and cycle >= 1 and n_layers % cycle == 0):
        return False
    if 2 ** (cycle - 1) >= t:
        return False
    e = stream_esize
    streams = 2 * (t * c * e          # xsave
                   + t * 2 * c * e    # cond
                   + 3 * c * 2 * c * e + c * 2 * c * e   # wd, wo
                   + t * c * e        # dout
                   + t * 2 * c * e    # dcp out
                   + t * c * 4)       # dx0 out
    accum = (3 * c * 2 * c + c * 2 * c + 4 * 2 * c) * 4  # dwd/dwo/dbd/dbo
    resident = batch * t * c * 4                          # dx carry
    return streams + accum + resident <= vmem_budget


def _sd(stream_dtype: str, x0):
    return jnp.bfloat16 if stream_dtype == "bf16" else x0.dtype


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def residual_stack_train_batched(x0, step_bias, cond_proj, wd, bd, wo, bo,
                                 cycle: int, interpret: bool = False,
                                 stream_dtype: str = "bf16"):
    """Differentiable fused residual stack over a whole batch.

    x0 [B, T, C]; step_bias [L, B, C]; cond_proj [L, B, T, 2C]; weights as
    in :func:`residual_stack`.  Forward is the vmapped per-sample kernel
    (weights stream per sample but overlap with compute); backward is ONE
    (layer, batch)-grid kernel that accumulates the weight grads in VMEM.

    ``stream_dtype="bf16"`` (default) streams weights/conditioner/saved
    activations/cotangents as bf16: matmul numerics are IDENTICAL (the MXU
    rounds f32 operands to bf16 either way — see ``supported``); only the
    additive conditioner term and the recomputed-gate rounding differ from
    the f32-stream path, which ``stream_dtype="f32"`` restores exactly."""
    sd = _sd(stream_dtype, x0)
    wd16, wo16 = wd.astype(sd), wo.astype(sd)
    cond16 = cond_proj.astype(sd)
    return jax.vmap(
        lambda x1, sb1, cp1: residual_stack(
            x1, sb1, cp1, wd16, bd, wo16, bo, cycle=cycle,
            interpret=interpret),
        in_axes=(0, 1, 1))(x0, step_bias, cond16)


def _rstb_fwd(x0, step_bias, cond_proj, wd, bd, wo, bo, cycle, interpret,
              stream_dtype):
    sd = _sd(stream_dtype, x0)
    wd16, wo16 = wd.astype(sd), wo.astype(sd)
    cond16 = cond_proj.astype(sd)
    out, xsave = jax.vmap(
        lambda x1, sb1, cp1: _call_fwd(
            x1, sb1, cp1, wd16, bd, wo16, bo, cycle=cycle,
            interpret=interpret, save_dtype=sd),
        in_axes=(0, 1, 1))(x0, step_bias, cond16)
    # zero-size sentinels carry the PRIMAL dtypes to the bwd (cotangents
    # must match them; dtype objects themselves are not valid residual
    # pytree leaves)
    return out, (xsave, step_bias, cond16, wd16, bd, wo16, bo,
                 jnp.zeros((), x0.dtype), jnp.zeros((), cond_proj.dtype),
                 jnp.zeros((), wd.dtype), jnp.zeros((), wo.dtype))


def _rstb_bwd(cycle, interpret, stream_dtype, res, dout):
    (xsave, step_bias, cond16, wd16, bd, wo16, bo,
     x0_s, cond_s, wd_s, wo_s) = res
    sd = _sd(stream_dtype, dout)
    dx0, dsb, dcp, dwd, dbd, dwo, dbo = _call_bwd_batched(
        xsave, step_bias, cond16, wd16, bd, wo16, bo, dout.astype(sd),
        cycle=cycle, interpret=interpret)
    # cotangent dtypes must match the (f32) primals; the bf16->f32 converts
    # are lazy and fuse into the consuming matmuls/reductions
    return (dx0.astype(x0_s.dtype), dsb.astype(step_bias.dtype),
            dcp.astype(cond_s.dtype), dwd.astype(wd_s.dtype),
            dbd.astype(bd.dtype), dwo.astype(wo_s.dtype),
            dbo.astype(bo.dtype))


residual_stack_train_batched.defvjp(_rstb_fwd, _rstb_bwd)
