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
    (the only residual needed: z/gates are recomputed in the backward)."""
    l = pl.program_id(0)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    @pl.when(l == 0)
    def _init():
        x_ref[:] = x0_ref[:]
        skip_ref[:] = jnp.zeros((t, c), jnp.float32)

    x = x_ref[:]
    xsave_ref[0] = x
    y32 = x.astype(jnp.float32) + sb_ref[0, 0].astype(jnp.float32)
    y = y32.astype(x.dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, (t, c), 0)

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
    h = (jax.nn.sigmoid(z[:, :c]) * jnp.tanh(z[:, c:])).astype(x.dtype)
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
              interpret: bool):
    n_layers, t, c2 = cond_proj.shape
    c = c2 // 2
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
            jax.ShapeDtypeStruct((n_layers, t, c), x0.dtype),
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
