"""Pallas TPU kernel: the fused HiFi-GAN "tail" — every generator stage
whose activation fits the uniform channel-packed ``[T_b, 128]`` layout —
in ONE kernel, activations VMEM-resident.

Why: the channel-packed XLA path (ops/packed_conv.py) already turns the
C < 128 late stages into dense 128-lane stride-1 convolutions, but every
one of the ~56 convs in the tail still round-trips its ~29 MB activation
through HBM, and XLA schedules each as a separate fusion.  The key
structural fact this kernel exploits: once packing starts, the *block
count* is invariant — a packed ConvT multiplies the pack factor by its
stride, so ``T_b = T_mel * prod(rates[:s0+1])`` stays constant from the
first C == 128 stage all the way to conv_post, and every weight is (or
packs to) a stack of ``[128, 128]`` tap matrices applied at static block
offsets.  That makes the whole tail a flat program of
``z[t] += x[t + m] @ W_m`` ops over one ``[T_b, 128]`` buffer: exactly the
shifted-matmul shape of ops/pallas/diffnet_stack.py, with rolls providing
the static shifts and the MXU doing the taps.

The kernel tiles time (grid = time tiles) with a halo wide enough for the
full receptive field of the tail, so VMEM holds four ~(TS+2H, 128) fp32
buffers plus the whole tap-weight stack (~14 MB bf16) regardless of audio
length.  Per-conv boundary masking reproduces XLA's per-conv zero padding
exactly: rows outside the true [0, T_b) range are re-zeroed after every
conv (conv-of-zeros + bias is NOT zero, so this must happen per conv, not
once).  Out-of-tile fringe rows hold wrapped-roll garbage that never
reaches the tile's written center (standard halo shrinkage).

Numerics: buffers are fp32, accumulation fp32; the MXU taps run at bf16
operand precision (Mosaic lowers f32 jnp.dot as a single bf16 pass), which
matches XLA's default TPU matmul precision — parity with apply_packed is
therefore to bf16-operand accuracy on TPU and exact-f32 in interpret mode
(tests).  Weights are stored bf16 by default (halves the resident stack).

Behavior target: reference ``modules/nsf_hifigan/models.py:325-396`` /
``modules/hifigan/hifigan.py:104-178`` (via the already-parity-tested
vocoders/generator.py).  No reference counterpart for the kernel itself —
TPU-native design.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas requires a TPU-capable lowering; import lazily
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_OK = True
except Exception:  # pragma: no cover
    PALLAS_OK = False

LANES = 128
VMEM_LIMIT = 100 * 2**20


def _roll(x, shift: int):
    """Static circular shift along axis 0: out[i] = x[i - shift]."""
    try:
        return pltpu.roll(x, shift=shift % x.shape[0], axis=0)
    except Exception:  # interpret mode on CPU has no TPU lowering
        return jnp.roll(x, shift, axis=0)


# ---------------------------------------------------------------------------
# Static plan
# ---------------------------------------------------------------------------

class ConvPlan(NamedTuple):
    offsets: Tuple[int, ...]   # nonzero tap block-offsets m
    w0: int                    # first tap index in the wcat stack
    bi: int                    # bias row in bcat


class StagePlan(NamedTuple):
    convt: Optional[ConvPlan]  # None for the first kernel stage
    inject: int                # in_buf slot added after the ConvT, or -1
    # ('rb1', (c1,c2,c1,c2,..)) per-dilation conv pairs, or ('rb2', (c,..))
    branches: Tuple[Tuple[str, Tuple[ConvPlan, ...]], ...]


class TailPlan(NamedTuple):
    s0: int                    # first generator stage inside the kernel
    stages: Tuple[StagePlan, ...]
    post: ConvPlan
    p_fin: int                 # conv_post pack factor (wav samples/row)
    halo: int                  # one-sided receptive field, block rows
    n_in: int                  # streamed inputs: x + per-stage injections
    n_taps: int
    n_convs: int


def kernel_start_stage(cfg, lane_target: int = LANES) -> Optional[int]:
    """First stage index s0 the kernel can own: C_{s0} == 128 with pack
    factor 1, and every later stage packs to exactly 128 lanes.  None when
    the config never reaches the uniform layout (kernel unsupported)."""
    from ...vocoders.generator import _stage_channels, pack_schedule

    if lane_target != LANES:
        return None
    sched = pack_schedule(cfg, lane_target)
    s0 = None
    for i in range(len(cfg.upsample_rates)):
        c, (_, p) = _stage_channels(cfg, i), sched[i]
        if s0 is None:
            if c == LANES and p == 1:
                s0 = i
        elif c * p != LANES:
            return None
    return s0


class _Builder:
    def __init__(self):
        self.taps, self.biases, self.convs = [], [], 0

    def add(self, w: np.ndarray, b: Optional[np.ndarray],
            m_min: int) -> ConvPlan:
        """w: [S, 128, C_out<=128] stacked block taps (tap s at offset
        m_min + s); all-zero blocks are dropped."""
        offs, w0 = [], len(self.taps)
        co = w.shape[2]
        for s in range(w.shape[0]):
            if not np.any(w[s]):
                continue
            tap = w[s]
            if co < LANES:
                tap = np.pad(tap, ((0, 0), (0, LANES - co)))
            self.taps.append(tap)
            offs.append(m_min + s)
        bias = np.zeros((LANES,), np.float32)
        if b is not None:
            bias[: b.shape[0]] = np.asarray(b, np.float32)
        self.biases.append(bias)
        self.convs += 1
        return ConvPlan(tuple(offs), w0, self.convs - 1)

    def add_plain(self, p: dict, dilation: int, pad: int) -> ConvPlan:
        """Unpacked [k, 128, 128] conv as k taps at offsets j*d - pad."""
        w = np.asarray(p["w"])
        k = w.shape[0]
        offs, w0 = [], len(self.taps)
        for j in range(k):
            self.taps.append(w[j])
            offs.append(j * dilation - pad)
        bias = np.asarray(p.get("b", np.zeros((LANES,))), np.float32)
        self.biases.append(bias)
        self.convs += 1
        return ConvPlan(tuple(offs), w0, self.convs - 1)


def _one_sided(cp: ConvPlan) -> int:
    return max(max(-min(cp.offsets), max(cp.offsets)), 0)


def build_plan(plain_params, packed_params, cfg, lane_target: int = LANES):
    """Static tail plan + device weight stacks from generator params.

    :param plain_params: generator params from :func:`generator.init` (or a
        converted checkpoint) — used for the unpacked s0-stage resblocks.
    :param packed_params: :func:`generator.pack_params` output — used for
        every packed stage.
    :returns: (TailPlan, wcat [N,128,128], bcat [n_convs,128]) or None.
    """
    from .. import packed_conv as pc
    from ...vocoders.generator import pack_schedule

    s0 = kernel_start_stage(cfg, lane_target)
    if s0 is None:
        return None
    sched = pack_schedule(cfg, lane_target)
    bld = _Builder()
    stages, halo, n_in = [], 0, 1

    for i in range(s0, len(cfg.upsample_rates)):
        u, k = cfg.upsample_rates[i], cfg.upsample_kernel_sizes[i]
        p_in, p_st = sched[i]
        convt = None
        if i > s0:
            m_min, _ = pc.convt_span(k, u, (k - u) // 2, p_in)
            convt = bld.add(np.asarray(packed_params["ups"][i]["w"]),
                            np.asarray(packed_params["ups"][i].get("b")),
                            m_min)
            halo += _one_sided(convt)
        inject = -1
        if cfg.use_nsf and i > s0:
            inject = n_in
            n_in += 1
        branches, chain_max = [], 0
        for j, (k_rb, d_rb) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
            blk_pl = plain_params["resblocks"][i][j]
            blk_pk = packed_params["resblocks"][i][j]
            convs, chain = [], 0
            if cfg.resblock == "1":
                for ci, d in enumerate(d_rb):
                    for key, dd in (("convs1", d), ("convs2", 1)):
                        if p_st == 1:
                            cp = bld.add_plain(blk_pl[key][ci], dd,
                                               (k_rb * dd - dd) // 2)
                        else:
                            m_min, _ = pc.conv1d_span(
                                k_rb, dd, (k_rb * dd - dd) // 2, p_st)
                            cp = bld.add(np.asarray(blk_pk[key][ci]["w"]),
                                         np.asarray(blk_pk[key][ci].get("b")),
                                         m_min)
                        convs.append(cp)
                        chain += _one_sided(cp)
                branches.append(("rb1", tuple(convs)))
            else:
                for ci, d in enumerate(d_rb):
                    if p_st == 1:
                        cp = bld.add_plain(blk_pl["convs"][ci], d,
                                           (k_rb * d - d) // 2)
                    else:
                        m_min, _ = pc.conv1d_span(
                            k_rb, d, (k_rb * d - d) // 2, p_st)
                        cp = bld.add(np.asarray(blk_pk["convs"][ci]["w"]),
                                     np.asarray(blk_pk["convs"][ci].get("b")),
                                     m_min)
                    convs.append(cp)
                    chain += _one_sided(cp)
                branches.append(("rb2", tuple(convs)))
            chain_max = max(chain_max, chain)
        halo += chain_max
        stages.append(StagePlan(convt, inject, tuple(branches)))

    p_fin = sched[-1][1]
    if p_fin > 1:
        k_post = int(np.asarray(packed_params["conv_post_plain"]["w"]).shape[0])
        m_min, _ = pc.conv1d_span(k_post, 1, (k_post - 1) // 2, p_fin)
        post = bld.add(np.asarray(packed_params["conv_post"]["w"]),
                       np.asarray(packed_params["conv_post"].get("b")), m_min)
    else:
        post = bld.add_plain(
            plain_params["conv_post"], 1,
            (int(np.asarray(plain_params["conv_post"]["w"]).shape[0]) - 1) // 2)
    halo += _one_sided(post)

    plan = TailPlan(s0, tuple(stages), post, p_fin, halo, n_in,
                    len(bld.taps), bld.convs)
    wcat = jnp.asarray(np.stack(bld.taps))
    bcat = jnp.asarray(np.stack(bld.biases))
    return plan, wcat, bcat


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _leaky(x, slope):
    return jnp.where(x > 0, x, x * slope)


def _make_kernel(plan: TailPlan, *, t_b: int, ts: int, halo_pad: int,
                 tap_group: int = 8):
    rows = ts + 2 * halo_pad

    def conv(wcat_ref, bcat_ref, inr, xin, cp: ConvPlan):
        # Tap-concatenated contraction: the MXU runs one 128x128 pass per
        # K-tile (M cycles each) regardless of dtype, so S separate
        # [rows,128]x[128,128] dots serialize on ONE MXU.  Concatenating
        # up to ``tap_group`` rolled taps into a single K = G*128 dot lets
        # Mosaic split the contraction across the TensorCore's parallel
        # MXUs (same trick that gets diffnet_stack to 73% MFU at K=384).
        z = None
        S = len(cp.offsets)
        for g0 in range(0, S, tap_group):
            idxs = list(range(g0, min(g0 + tap_group, S)))
            if len(idxs) == 1:
                m = cp.offsets[idxs[0]]
                xr = _roll(xin, -m) if m else xin
                w = wcat_ref[cp.w0 + idxs[0]].astype(jnp.float32)
            else:
                xr = jnp.concatenate(
                    [_roll(xin, -cp.offsets[i]) if cp.offsets[i] else xin
                     for i in idxs], axis=1)
                w = wcat_ref[cp.w0 + idxs[0]: cp.w0 + idxs[-1] + 1]
                w = w.astype(jnp.float32).reshape(len(idxs) * LANES, LANES)
            d = jnp.dot(xr, w, preferred_element_type=jnp.float32)
            z = d if z is None else z + d
        z = z + bcat_ref[cp.bi]
        # per-conv zero padding at the true sequence boundary (matches
        # nn.conv1d's explicit padding in the XLA packed path)
        return jnp.where(inr, z, 0.0)

    def kernel(x_hbm, wcat_ref, bcat_ref, out_ref, in_buf, sems):
        tile = pl.program_id(0)
        base = tile * ts
        copies = [
            pltpu.make_async_copy(
                x_hbm.at[i, pl.ds(base, rows), :], in_buf.at[i], sems.at[i])
            for i in range(plan.n_in)
        ]
        for c in copies:
            c.start()
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        g = row + (base - halo_pad)
        inr = jnp.logical_and(g >= 0, g < t_b)
        for c in copies:
            c.wait()

        cv = functools.partial(conv, wcat_ref, bcat_ref, inr)
        x = in_buf[0]
        for st in plan.stages:
            if st.convt is not None:
                x = cv(_leaky(x, 0.1), st.convt)
                if st.inject >= 0:
                    x = x + in_buf[st.inject]
            xs = None
            for kind, convs in st.branches:
                xt0 = x
                if kind == "rb1":
                    for ci in range(0, len(convs), 2):
                        xt = cv(_leaky(xt0, 0.1), convs[ci])
                        xt = cv(_leaky(xt, 0.1), convs[ci + 1])
                        xt0 = xt + xt0
                else:
                    for cp in convs:
                        xt0 = cv(_leaky(xt0, 0.1), cp) + xt0
                xs = xt0 if xs is None else xs + xt0
            x = xs * (1.0 / len(st.branches))
        y = cv(_leaky(x, 0.01), plan.post)   # final F.leaky_relu default slope
        out_ref[:] = jnp.tanh(y[halo_pad:halo_pad + ts, :plan.p_fin])

    return kernel, rows


def supported(plan: Optional[TailPlan], batch: int, ts: int = 4096,
              vmem_budget: int = 90 * 2**20) -> bool:
    if plan is None or not PALLAS_OK or batch != 1:
        return False
    halo_pad = -(-plan.halo // 8) * 8
    rows = ts + 2 * halo_pad
    # live-buffer count calibrated on v5e: Mosaic's measured stack usage at
    # production dims was ~27 fp32 row-buffers (119 MB at rows=8512), not
    # the naive 4-6 — the unrolled tap program keeps many intermediates
    resident = (plan.n_taps * LANES * LANES * 2        # bf16 tap stack
                + plan.n_in * rows * LANES * 4         # streamed inputs
                + 28 * rows * LANES * 4)               # live fp32 buffers
    return resident <= vmem_budget


def tail(x_stack: jnp.ndarray, wcat, bcat, plan: TailPlan, *, t_b: int,
         ts: int = 4096, interpret: bool = False) -> jnp.ndarray:
    """Run the fused tail.

    :param x_stack: [n_in, T_b, 128] float32 — slot 0 is the stage-s0
        activation (prologue output: through stage s0's ConvT + injection),
        slots 1.. are the packed NSF injections for later stages in order.
    :returns: [T_b, p_fin] float32 wav samples (tanh applied); reshape to
        [T_b * p_fin] for the waveform.
    """
    halo_pad = -(-plan.halo // 8) * 8
    ts = min(ts, -(-t_b // 8) * 8)
    n_tiles = -(-t_b // ts)
    t_pad = n_tiles * ts + 2 * halo_pad
    x_stack = jnp.pad(
        x_stack.astype(jnp.float32),
        ((0, 0), (halo_pad, t_pad - halo_pad - t_b), (0, 0)))
    kernel, rows = _make_kernel(plan, t_b=t_b, ts=ts, halo_pad=halo_pad)
    flops = 2 * n_tiles * rows * LANES * LANES * plan.n_taps
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((plan.n_taps, LANES, LANES), lambda i: (0, 0, 0)),
            pl.BlockSpec((plan.n_convs, LANES), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((ts, plan.p_fin), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * ts, plan.p_fin),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((plan.n_in, rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((plan.n_in,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x_stack.size * 4, transcendentals=0),
        interpret=interpret,
    )(x_stack, wcat, bcat)
    return out[:t_b]
