"""DiffNet — the non-causal WaveNet denoiser, TPU-native.

Architecture parity with reference ``network/diff/net.py:58-135``:
1x1 input projection -> ReLU -> ``residual_layers`` gated residual blocks
(dilated conv k=3, dilation 2^(i % dilation_cycle_length), FiLM-style
diffusion-step add and 1x1 conditioner add) -> skip-sum/sqrt(L) -> 1x1 ->
ReLU -> zero-init 1x1 output projection.

TPU design: channels-last [B, T, C]; every 1x1 conv is a lane-dim matmul on
the MXU; the gated dilated convs are left to XLA fusion (a fused Pallas
residual-block kernel is an optional fast path in ``ops/pallas``).
The layer stack is grouped into dilation cycles and run with ``jax.lax.scan``
over the cycles so the compiled graph stays small at any depth.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import nn


class DiffNetConfig(NamedTuple):
    in_dims: int = 80           # mel bins
    encoder_hidden: int = 256   # hidden_size
    residual_layers: int = 20
    residual_channels: int = 256
    dilation_cycle_length: int = 4
    remat: bool = False         # rematerialize each dilation cycle in bwd
    pallas_stack: str = "auto"  # auto/on (TPU bf16 inference) | off | interpret (CPU tests)
    pallas_train: str = "auto"  # fused fwd+bwd training kernel: auto/on (TPU) | off | interpret
    train_stream: str = "bf16"  # stream dtype of the fused train kernel: bf16 | f32

    @classmethod
    def from_hparams(cls, hp):
        return cls(
            in_dims=hp["audio_num_mel_bins"],
            encoder_hidden=hp["hidden_size"],
            residual_layers=hp["residual_layers"],
            residual_channels=hp["residual_channels"],
            dilation_cycle_length=hp["dilation_cycle_length"],
            remat=bool(hp.get("use_remat", False)),
            pallas_stack=str(hp.get("diffnet_pallas", "auto")),
            pallas_train=str(hp.get("diffnet_pallas_train", "auto")),
            train_stream=str(hp.get("diffnet_train_stream_dtype", "bf16")),
        )


def init(key, cfg: DiffNetConfig):
    c, h, m = cfg.residual_channels, cfg.encoder_hidden, cfg.in_dims
    n_layers = cfg.residual_layers
    keys = jax.random.split(key, 6 + 4 * n_layers)

    layers = []
    for i in range(n_layers):
        k0, k1, k2, k3 = keys[6 + 4 * i : 10 + 4 * i]
        layers.append({
            "dilated_conv": nn.init_conv1d(k0, 3, c, 2 * c, init="kaiming_normal"),
            "diffusion_projection": nn.init_linear(k1, c, c),
            "conditioner_projection": nn.init_conv1d(k2, 1, h, 2 * c, init="kaiming_normal"),
            "output_projection": nn.init_conv1d(k3, 1, c, 2 * c, init="kaiming_normal"),
        })
    # Stack per-cycle so lax.scan can iterate cycles of the dilation pattern.
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    return {
        "input_projection": nn.init_conv1d(keys[0], 1, m, c, init="kaiming_normal"),
        "mlp": {
            "w1": nn.init_linear(keys[1], c, c * 4),
            "w2": nn.init_linear(keys[2], c * 4, c),
        },
        "layers": stacked,
        "skip_projection": nn.init_conv1d(keys[3], 1, c, c, init="kaiming_normal"),
        "output_projection": nn.init_conv1d(keys[4], 1, c, m, init="zero"),
    }


def _residual_block(p, x, cond_proj, step_emb, dilation: int):
    """One gated residual block. x: [B, T, C]; cond_proj: [B, T, 2C]
    (pre-projected); step_emb: [B, C]. Returns (x', skip)."""
    y = x + step_emb[:, None, :]
    y = nn.conv1d(p["dilated_conv"], y, dilation=dilation) + cond_proj
    gate, filt = jnp.split(y, 2, axis=-1)
    y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
    y = nn.conv1d(p["output_projection"], y)
    residual, skip = jnp.split(y, 2, axis=-1)
    return (x + residual) * (1.0 / math.sqrt(2.0)), skip


def prepare_cond(params, cond):
    """Pre-project the conditioner through all layers' 1x1 convs in one
    batched matmul: cond [B, T, H] -> [L, B, T, 2C].

    The conditioner is constant across the whole sampling loop, so samplers
    hoist this out of the scan (it is ~15% of the per-NFE FLOPs otherwise).
    """
    cond_w = params["layers"]["conditioner_projection"]["w"][:, 0]  # [L, H, 2C]
    cond_b = params["layers"]["conditioner_projection"]["b"]        # [L, 2C]
    return jnp.einsum("bth,lhc->lbtc", cond, cond_w) + cond_b[:, None, None, :]


# Data mesh for the fused train kernel, declared by training/task.py (or a
# test) before the step traces. Read at TRACE time: when set to a data-only
# mesh, the train kernel is wrapped in shard_map so each device runs its own
# pallas call on its local batch shard — GSPMD never has to partition the
# custom call, which was the reason multi-chip used to forfeit the kernel.
_TRAIN_MESH = None


def set_train_mesh(mesh):
    """Declare (or clear, with None) the mesh for pallas_train sharding.
    Returns the previous value so callers/tests can restore it."""
    global _TRAIN_MESH
    prev = _TRAIN_MESH
    _TRAIN_MESH = mesh
    return prev


def _shardable_data_mesh(b: int):
    """The declared mesh, iff the fused train kernel can run under it:
    a 'data' axis that divides the batch, and no other axis actually
    sharding anything (a seq-sharded T needs the halo-exchange scan)."""
    m = _TRAIN_MESH
    if m is None or "data" not in m.axis_names:
        return None
    if any(s > 1 for ax, s in m.shape.items() if ax != "data"):
        return None
    dp = m.shape["data"]
    if dp <= 1 or b % dp != 0:
        return None
    return m


def apply(params, cfg: DiffNetConfig, spec, diffusion_step, cond=None,
          cond_proj=None, inference: bool = False):
    """Predict noise.

    :param spec: [B, T, M] noisy mel (channels-last; callers using the
        reference's [B, 1, M, T] should transpose first)
    :param diffusion_step: [B] int timestep
    :param cond: [B, T, H] conditioner (or pass a precomputed ``cond_proj``)
    :return: [B, T, M] noise prediction
    """
    c = cfg.residual_channels
    cycle = cfg.dilation_cycle_length
    n_layers = cfg.residual_layers
    assert n_layers % cycle == 0, "residual_layers must be a multiple of dilation_cycle_length"
    n_cycles = n_layers // cycle

    x = nn.conv1d(params["input_projection"], spec)
    x = jax.nn.relu(x)

    step = nn.sinusoidal_pos_emb(diffusion_step, c)
    step = nn.linear(params["mlp"]["w1"], step)
    step = nn.mish(step)
    step = nn.linear(params["mlp"]["w2"], step)  # [B, C]
    step = step.astype(x.dtype)

    if cond_proj is None:
        cond_proj = prepare_cond(params, cond)
    cond_proj = cond_proj.astype(x.dtype)

    # --- fused Pallas residual stack (ops/pallas/diffnet_stack.py): the
    # whole 20-layer stack in one kernel, activations resident in VMEM,
    # per-layer weights streamed. Used for single-stream TPU inference;
    # training/backward and unaligned shapes fall through to the scan.
    # (inference-only: pallas_call has no autodiff rule, so training keeps
    # the differentiable lax.scan below)
    mode = cfg.pallas_stack
    b, t_len, _ = spec.shape
    if inference and mode in ("auto", "on", "interpret"):
        from ..ops.pallas import diffnet_stack as _stack

        # real Mosaic lowering exists only on TPU — 'on' off-TPU falls back
        # to the scan rather than crashing; 'interpret' forces the (slow)
        # interpreter anywhere. fp32 always keeps the XLA scan (Mosaic f32
        # dots are single-pass bf16; see diffnet_stack.supported).
        want = mode == "interpret" or jax.default_backend() == "tpu"
        esz = 2 if mode == "interpret" else x.dtype.itemsize
        if want and _stack.supported(n_layers, cycle, t_len, c, 1, esize=esz):
            dp = params["layers"]["diffusion_projection"]
            sb = (jnp.einsum("bc,lcd->lbd", step, dp["w"])
                  + dp["b"][:, None, :]).astype(x.dtype)     # [L, B, C]
            wd = params["layers"]["dilated_conv"]["w"]
            bd = params["layers"]["dilated_conv"]["b"]
            wo = params["layers"]["output_projection"]["w"][:, 0]
            bo = params["layers"]["output_projection"]["b"]
            interp = mode == "interpret"
            if b == 1:
                skip_sum = _stack.residual_stack(
                    x[0], sb[:, 0], cond_proj[:, 0], wd, bd, wo, bo,
                    cycle=cycle, interpret=interp)[None]
            else:
                # batched serving: vmap lifts the sample axis to a leading
                # grid dimension (scratch re-inits at layer 0 per sample —
                # same order the training kernel relies on; parity tested)
                skip_sum = jax.vmap(
                    lambda x1, sb1, cp1: _stack.residual_stack(
                        x1, sb1, cp1, wd, bd, wo, bo, cycle=cycle,
                        interpret=interp),
                    in_axes=(0, 1, 1))(x, sb, cond_proj)
            x = (skip_sum * (1.0 / math.sqrt(n_layers))).astype(x.dtype)
            x = nn.conv1d(params["skip_projection"], x)
            x = jax.nn.relu(x)
            return nn.conv1d(params["output_projection"], x)

    # --- fused fwd+bwd training kernel (custom VJP around the same
    # residual-stack kernel; ops/pallas/diffnet_stack.residual_stack_train).
    # Saves only each layer's input x_l and recomputes the gates in a
    # single reverse-order backward kernel that also produces the weight /
    # conditioner / step-bias grads. fp32 activations are allowed here:
    # Mosaic's f32 dots are bf16-operand/f32-accumulate — the SAME
    # precision as XLA's default training matmuls (parity to default-
    # precision accuracy, tests/test_diffnet_stack_train.py).
    tmode = cfg.pallas_train
    if (not inference) and tmode in ("auto", "on", "interpret"):
        from ..ops.pallas import diffnet_stack as _stack

        # single-device runs the kernel directly; under a data-only mesh
        # (declared via set_train_mesh) the kernel is wrapped in shard_map
        # — the batch axis is embarrassingly parallel, each device runs one
        # pallas call on its local shard, and shard_map's transpose psums
        # the replicated weight/step/conditioner grads over 'data' exactly
        # like the scan path's GSPMD all-reduce. Seq-sharded meshes keep
        # the halo-exchange scan below.
        mesh = _shardable_data_mesh(b)
        n_dp = mesh.shape["data"] if mesh is not None else 1
        want = (tmode == "interpret"
                or (jax.default_backend() == "tpu"
                    and (len(jax.devices()) == 1 or mesh is not None)))
        # prefer the batch-fused backward (weights stream once per layer,
        # weight grads accumulate in VMEM — ~2x the vmapped backward at
        # prod dims, runs/train_decompose); fall back to the vmapped
        # per-sample kernel when the [B_local, T, C] dx carry won't fit
        esz = 2 if cfg.train_stream == "bf16" else 4
        ok_batched = _stack.supported_train_batched(
            n_layers, cycle, t_len, c, max(1, b // n_dp), stream_esize=esz)
        if want and (ok_batched or _stack.supported_train(
                n_layers, cycle, t_len, c)):
            dp = params["layers"]["diffusion_projection"]
            sb = (jnp.einsum("bc,lcd->lbd", step, dp["w"])
                  + dp["b"][:, None, :]).astype(x.dtype)   # [L, B, C]
            wd = params["layers"]["dilated_conv"]["w"]
            bd = params["layers"]["dilated_conv"]["b"]
            wo = params["layers"]["output_projection"]["w"][:, 0]
            bo = params["layers"]["output_projection"]["b"]
            interp = tmode == "interpret"

            if ok_batched:
                if cfg.train_stream == "bf16":
                    # hand the kernel a bf16 cond_proj directly: XLA fuses
                    # the convert into the prepare_cond einsum epilogue, so
                    # the [L, B, T, 2C] intermediate is never materialized
                    # in f32 (the VJP would cast to bf16 anyway — kernel
                    # inputs are bit-identical; the dcp cotangent comes
                    # back bf16 and feeds matmuls that round operands to
                    # bf16 regardless)
                    cond_proj = cond_proj.astype(jnp.bfloat16)

                def stack_fn(x_s, sb_s, cp_s, wd_, bd_, wo_, bo_):
                    return _stack.residual_stack_train_batched(
                        x_s, sb_s, cp_s, wd_, bd_, wo_, bo_, cycle,
                        interp, cfg.train_stream)
            else:
                def stack_fn(x_s, sb_s, cp_s, wd_, bd_, wo_, bo_):
                    def one(x1, sb1, cp1):
                        return _stack.residual_stack_train(
                            x1, sb1, cp1, wd_, bd_, wo_, bo_, cycle, interp)

                    return jax.vmap(one, in_axes=(0, 1, 1))(x_s, sb_s, cp_s)

            if mesh is not None:
                from jax.sharding import PartitionSpec as P

                # check_vma=False: pallas_call does not declare varying-
                # across-mesh info on its outputs, so the vma checker cannot
                # see through it; the unchecked transpose still psums the
                # replicated-input (weight) grads correctly — parity-tested
                # on the 8-device CPU mesh in tests/test_diffnet_stack_train
                skip_sum = jax.shard_map(
                    stack_fn, mesh=mesh,
                    in_specs=(P("data"), P(None, "data"), P(None, "data"),
                              P(), P(), P(), P()),
                    out_specs=P("data"),
                    check_vma=False)(x, sb, cond_proj, wd, bd, wo, bo)
            else:
                skip_sum = stack_fn(x, sb, cond_proj, wd, bd, wo, bo)
            x = (skip_sum * (1.0 / math.sqrt(n_layers))).astype(x.dtype)
            x = nn.conv1d(params["skip_projection"], x)
            x = jax.nn.relu(x)
            return nn.conv1d(params["output_projection"], x)

    # Reshape stacked layer params into [n_cycles, cycle, ...] and scan cycles.
    def _regroup(a):
        return a.reshape((n_cycles, cycle) + a.shape[1:])

    lp = jax.tree.map(_regroup, {
        "dilated_conv": params["layers"]["dilated_conv"],
        "diffusion_projection": params["layers"]["diffusion_projection"],
        "output_projection": params["layers"]["output_projection"],
    })
    cond_proj_g = cond_proj.reshape((n_cycles, cycle) + cond_proj.shape[1:])

    def cycle_body(x, inp):
        lpc, cpc = inp
        skips = []
        for j in range(cycle):
            pj = jax.tree.map(lambda a: a[j], lpc)
            step_j = nn.linear(pj["diffusion_projection"], step)
            x, skip = _residual_block(
                {"dilated_conv": pj["dilated_conv"],
                 "output_projection": pj["output_projection"]},
                x, cpc[j], step_j, dilation=2**j)
            skips.append(skip)
        return x, jnp.stack(skips).sum(0)

    if cfg.remat:
        # trade FLOPs for memory: only cycle boundaries are saved in the
        # backward pass (activations within a cycle are recomputed)
        cycle_body = jax.checkpoint(cycle_body)

    x, skip_sums = jax.lax.scan(cycle_body, x, (lp, cond_proj_g))
    x = skip_sums.sum(0) * (1.0 / math.sqrt(n_layers))
    x = nn.conv1d(params["skip_projection"], x)
    x = jax.nn.relu(x)
    x = nn.conv1d(params["output_projection"], x)
    return x
