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
