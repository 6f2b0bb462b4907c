"""HiFi-GAN v1 generator (+ NSF harmonic source), functional JAX.

Parity targets:
- ``modules/hifigan/hifigan.py:104-178`` (24 kHz generator, optional NSF
  source when ``use_pitch_embed``),
- ``modules/nsf_hifigan/models.py:148-396`` (openvpi 44.1 kHz NSF-HiFiGAN:
  SineGen cumsum-phase harmonic source, per-upsample-stage source injection).

Weight-norm is folded at conversion time, so parameters here are plain
kernels. Layout is channels-last [B, T, C]; the transposed-conv upsample
stack and dilated resblocks compile to MXU-tiled convolutions under XLA.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import nn

LRELU_SLOPE = 0.1


class HifiGanConfig(NamedTuple):
    num_mels: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    sampling_rate: int = 24000
    use_nsf: bool = False          # harmonic source injection
    harmonic_num: int = 8

    @classmethod
    def from_dict(cls, h: dict, use_nsf: bool = False):
        return cls(
            num_mels=int(h.get("num_mels", h.get("audio_num_mel_bins", 80))),
            upsample_initial_channel=int(h["upsample_initial_channel"]),
            upsample_rates=tuple(h["upsample_rates"]),
            upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
            resblock=str(h.get("resblock", "1")),
            resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(tuple(d) for d in h["resblock_dilation_sizes"]),
            sampling_rate=int(h.get("sampling_rate", h.get("audio_sample_rate", 24000))),
            use_nsf=use_nsf,
        )


# ---------------------------------------------------------------------------
# NSF source
# ---------------------------------------------------------------------------

def sine_gen_ht_from_randoms(rand_ini, unit_noise, f0_up: jnp.ndarray,
                             sr: int, harmonic_num: int = 8,
                             sine_amp: float = 0.1, noise_std: float = 0.003,
                             voiced_threshold: float = 0.0, lane0=None):
    """:func:`sine_gen_ht` core with the randomness passed in explicitly.

    ``rand_ini`` [B, H+1] ~ U[0,1) initial phases (harmonic 0 is forced to
    0 here), ``unit_noise`` [B, H+1, L] ~ N(0,1).  Used directly by the
    ONNX export, where the random draws become graph inputs instead of
    in-graph threefry ops (diffsvc_tpu/onnx/svc_export.py).
    """
    h = harmonic_num + 1
    f0 = f0_up[:, None, :] * (jnp.arange(1, h + 1, dtype=f0_up.dtype)[None, :, None])
    rad = (f0 / sr) % 1.0

    rand_ini = rand_ini * (jnp.arange(h) > 0).astype(rand_ini.dtype)[None, :]
    # first-sample phase offset as a masked add (a lane-0 scatter costs a
    # full relayout pass on TPU); callers with a dynamic length (the ONNX
    # export) pass a length-robust [L] mask instead of the baked iota
    if lane0 is None:
        lane0 = (jnp.arange(rad.shape[2]) == 0).astype(rad.dtype)
    rad = rad + rand_ini[:, :, None] * lane0[None, None, :]

    tmp_over_one = jnp.cumsum(rad, axis=2) % 1.0
    wrap = (tmp_over_one[:, :, 1:] - tmp_over_one[:, :, :-1]) < 0
    shift = jnp.concatenate(
        [jnp.zeros_like(rad[:, :, :1]), jnp.where(wrap, -1.0, 0.0)], axis=2)
    phase = jnp.cumsum(rad + shift, axis=2)
    sines = jnp.sin(2.0 * jnp.pi * phase) * sine_amp

    uv_ht = (f0_up[:, None, :] > voiced_threshold).astype(f0.dtype)
    noise_amp = uv_ht * noise_std + (1.0 - uv_ht) * sine_amp / 3.0
    return sines * uv_ht + noise_amp * unit_noise, uv_ht


def sine_gen_ht(rng, f0_up: jnp.ndarray, sr: int, harmonic_num: int = 8,
                sine_amp: float = 0.1, noise_std: float = 0.003,
                voiced_threshold: float = 0.0):
    """Harmonic sine source from sample-rate f0 [B, L], in [B, H, L] layout.

    Phase is the cumulative sum of per-sample instantaneous frequency with
    the reference's mod-1 overflow correction (models.py:183-213).

    Internal layout [B, H, L] keeps L in the lane dimension so every vector
    op (two cumsums, sin, threefry noise) runs on full 128-lane tiles — the
    reference layout [B, L, H=9] would use 9/128 lanes. Math, scan order
    and per-element noise statistics are unchanged; :func:`sine_gen`
    transposes back for the reference-layout API.
    """
    h = harmonic_num + 1
    k1, k2 = jax.random.split(rng)
    rand_ini = jax.random.uniform(k1, (f0_up.shape[0], h), dtype=f0_up.dtype)
    unit_noise = jax.random.normal(
        k2, (f0_up.shape[0], h, f0_up.shape[1]), f0_up.dtype)
    return sine_gen_ht_from_randoms(rand_ini, unit_noise, f0_up, sr,
                                    harmonic_num, sine_amp, noise_std,
                                    voiced_threshold)


def sine_gen(rng, f0_up: jnp.ndarray, sr: int, harmonic_num: int = 8,
             sine_amp: float = 0.1, noise_std: float = 0.003,
             voiced_threshold: float = 0.0):
    """Reference-layout API: (sine_waves [B, L, H+1], uv [B, L, 1])."""
    sines, uv_ht = sine_gen_ht(rng, f0_up, sr, harmonic_num, sine_amp,
                               noise_std, voiced_threshold)
    return sines.transpose(0, 2, 1), uv_ht.transpose(0, 2, 1)


def init_source_module(key, harmonic_num: int = 8):
    return {"l_linear": nn.init_linear(key, harmonic_num + 1, 1)}


def source_module(p, rng, f0_up, sr: int, harmonic_num: int = 8):
    """SourceModuleHnNSF: merge harmonics -> tanh(linear) [B, L, 1].

    The harmonic merge contracts H directly from the [B, H, L] source
    layout (no 16 MB transpose of the sine bank; the weighted sum over 9
    harmonics is a lane-parallel reduction)."""
    sines_ht, uv_ht = sine_gen_ht(rng, f0_up, sr, harmonic_num)
    return _merge_harmonics(p, sines_ht, uv_ht)


def source_module_from_randoms(p, rand_ini, unit_noise, f0_up, sr: int,
                               harmonic_num: int = 8, lane0=None):
    """:func:`source_module` with explicit random draws (ONNX export)."""
    sines_ht, uv_ht = sine_gen_ht_from_randoms(rand_ini, unit_noise, f0_up,
                                               sr, harmonic_num, lane0=lane0)
    return _merge_harmonics(p, sines_ht, uv_ht)


def _merge_harmonics(p, sines_ht, uv_ht):
    w = p["l_linear"]["w"][:, 0]   # [H+1]
    har = jnp.tanh(jnp.einsum("bhl,h->bl", sines_ht, w)
                   + p["l_linear"]["b"][0])
    return har[:, :, None], uv_ht.transpose(0, 2, 1)


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """torch.nn.Upsample(scale_factor=f) default 'nearest' on [B, T]."""
    return jnp.repeat(x, factor, axis=1)


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------

def init(key, cfg: HifiGanConfig):
    keys = iter(jax.random.split(key, 256))
    c0 = cfg.upsample_initial_channel
    params = {"conv_pre": nn.init_conv1d(next(keys), 7, cfg.num_mels, c0)}
    ups, noise_convs, resblocks = [], [], []
    ch = c0
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        c_cur = c0 // (2 ** (i + 1))
        ups.append(nn.init_conv_transpose1d(next(keys), k, ch, c_cur, u))
        if cfg.use_nsf:
            if i + 1 < len(cfg.upsample_rates):
                stride_f0 = int(np.prod(cfg.upsample_rates[i + 1:]))
                noise_convs.append(nn.init_conv1d(next(keys), stride_f0 * 2, 1, c_cur))
            else:
                noise_convs.append(nn.init_conv1d(next(keys), 1, 1, c_cur))
        blocks_i = []
        for k_rb, d_rb in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            if cfg.resblock == "1":
                blocks_i.append({
                    "convs1": [nn.init_conv1d(next(keys), k_rb, c_cur, c_cur) for _ in d_rb],
                    "convs2": [nn.init_conv1d(next(keys), k_rb, c_cur, c_cur) for _ in d_rb],
                })
            else:
                blocks_i.append({
                    "convs": [nn.init_conv1d(next(keys), k_rb, c_cur, c_cur) for _ in d_rb],
                })
        resblocks.append(blocks_i)
        ch = c_cur
    params["ups"] = ups
    params["resblocks"] = resblocks
    if cfg.use_nsf:
        params["noise_convs"] = noise_convs
        params["m_source"] = init_source_module(next(keys), cfg.harmonic_num)
    params["conv_post"] = nn.init_conv1d(next(keys), 7, ch, 1)
    return params


def _resblock1(p, x, kernel: int, dilations: Sequence[int]):
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        xt = nn.conv1d(c1, xt, dilation=d, padding=(kernel * d - d) // 2)
        xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
        xt = nn.conv1d(c2, xt, dilation=1, padding=(kernel - 1) // 2)
        x = xt + x
    return x


def _resblock2(p, x, kernel: int, dilations: Sequence[int]):
    for c, d in zip(p["convs"], dilations):
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        xt = nn.conv1d(c, xt, dilation=d, padding=(kernel * d - d) // 2)
        x = xt + x
    return x


def _stage_channels(cfg: HifiGanConfig, i: int) -> int:
    return cfg.upsample_initial_channel // (2 ** (i + 1))


def packing_enabled(hp) -> bool:
    """``vocoder_channel_pack`` hparam: on / off / auto.

    auto = pack on TPU when the vocoder runs fp32.  Measured on v5e
    (tools/bench_voc.py, 10 s @ 44.1 kHz, openvpi dims): packed fp32
    37.9 ms vs plain fp32 49.5 ms (1.31x) and vs plain bf16 46.1 ms —
    but packed *bf16* regresses to 50.4 ms (the structural-zero FLOPs
    cost more than the lane fill saves once inputs are half-width), so
    auto declines to pack a bf16 vocoder."""
    mode = str(hp.get("vocoder_channel_pack", "auto")).lower()
    if mode in ("1", "true", "on", "yes"):
        return True
    if mode in ("0", "false", "off", "no", "none"):
        return False
    voc_bf16 = str(hp.get("voc_compute_dtype", "")) in ("bf16", "bfloat16")
    return jax.default_backend() == "tpu" and not voc_bf16


def pack_schedule(cfg: HifiGanConfig, lane_target: int = 128):
    """Per-upsample-stage packing plan: (P_in, P_out).

    Packing starts at the first transposed conv whose output channels drop
    below ``lane_target`` (the MXU lane width); a packed ConvT multiplies
    the pack factor by its stride (P_out = P_in * u, constant block count).
    For halving-channel generators (c_i = c0 / 2^(i+1), the HiFi-GAN v1
    family and both production configs): lanes C*P never shrink once
    packing starts, and at pack start C*u >= 2C >= lane_target, so the
    natural growth alone reaches the target.  Configs whose first upsample
    stage already starts below lane_target/stride stay under-packed — a
    lane-utilization (perf) shortfall only, numerics unaffected."""
    p = 1
    sched = []
    for i, u in enumerate(cfg.upsample_rates):
        c_cur = _stage_channels(cfg, i)
        p_in = p
        if p_in > 1:
            p = p_in * u
        elif c_cur < lane_target:
            p = u
        sched.append((p_in, p))
    return tuple(sched)


def pack_params(params, cfg: HifiGanConfig, lane_target: int = 128):
    """Precompute the block-Toeplitz packed kernels (see ops/packed_conv.py)
    for every stage the schedule packs.  Plain stages pass through, so the
    result is apply_packed-compatible for any lane_target (including 0 =
    fully unpacked)."""
    from ..ops import packed_conv as pc

    sched = pack_schedule(cfg, lane_target)
    out = {"conv_pre": params["conv_pre"]}
    ups, resblocks = [], []
    p_fin = 1
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        p_in, p_stage = sched[i]
        if p_stage == 1:
            ups.append(params["ups"][i])
        else:
            ups.append(pc.pack_conv_transpose(
                params["ups"][i], p_in, u, (k - u) // 2))
        p_fin = p_stage
        blocks_i = []
        for j, (k_rb, d_rb) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
            blk = params["resblocks"][i][j]
            if p_stage == 1:
                blocks_i.append(blk)
            elif cfg.resblock == "1":
                blocks_i.append({
                    "convs1": [pc.pack_conv1d(c, p_stage, d, (k_rb * d - d) // 2)
                               for c, d in zip(blk["convs1"], d_rb)],
                    "convs2": [pc.pack_conv1d(c, p_stage, 1, (k_rb - 1) // 2)
                               for c in blk["convs2"]],
                })
            else:
                blocks_i.append({
                    "convs": [pc.pack_conv1d(c, p_stage, d, (k_rb * d - d) // 2)
                              for c, d in zip(blk["convs"], d_rb)],
                })
        resblocks.append(blocks_i)
    out["ups"] = ups
    out["resblocks"] = resblocks
    if cfg.use_nsf:
        out["noise_convs"] = params["noise_convs"]
        # packed stages also get a strided-packed twin so x_source lands
        # directly in the packed layout (no low-lane intermediate + pack)
        ncp_packed = []
        for i, (_, p_stage) in enumerate(sched):
            if p_stage == 1:
                ncp_packed.append(None)
            else:
                ncp = params["noise_convs"][i]
                k_nc = int(np.asarray(ncp["w"]).shape[0])
                s_nc = k_nc // 2 if k_nc > 1 else 1
                ncp_packed.append(pc.pack_strided_conv(ncp, p_stage, s_nc))
        out["noise_convs_packed"] = ncp_packed
        out["m_source"] = params["m_source"]
    k_post = int(np.asarray(params["conv_post"]["w"]).shape[0])
    if p_fin > 1:
        out["conv_post"] = pc.pack_conv1d(params["conv_post"], p_fin, 1,
                                          (k_post - 1) // 2)
        # keep the unpacked kernel too: apply_packed reads the true k_post
        # from its (static) shape instead of assuming the v1 default of 7
        out["conv_post_plain"] = params["conv_post"]
    else:
        out["conv_post"] = params["conv_post"]
    return out


def apply_packed(params, cfg: HifiGanConfig, mel: jnp.ndarray, f0=None,
                 rng=None, dtype=None, lane_target: int = 128):
    """Channel-packed twin of :func:`apply` (params from
    :func:`pack_params` with the same ``lane_target``).  Identical numerics
    up to matmul accumulation order; see ops/packed_conv.py for why this is
    several times faster on the MXU for the C<128 tail stages."""
    from ..ops import packed_conv as pc

    if "wcat" in params:
        # a Pallas-tail params dict (plain/packed/wcat/bcat) from
        # setup_serving: callers like the modular Svc batch-vocoder pass
        # wrapper.run_params directly — unwrap to the packed kernels
        params = params["packed"]

    sched = pack_schedule(cfg, lane_target)
    total_up = int(np.prod(cfg.upsample_rates))
    har_source = None
    if cfg.use_nsf and f0 is not None:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        f0_up = upsample_nearest(f0, total_up)
        har_source, _ = source_module(params["m_source"], rng, f0_up,
                                      cfg.sampling_rate, cfg.harmonic_num)

    if dtype is not None:
        params = jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, params)
        mel = mel.astype(dtype)
        if har_source is not None:
            har_source = har_source.astype(dtype)

    x = nn.conv1d(params["conv_pre"], mel, padding=3)
    n_kernels = len(cfg.resblock_kernel_sizes)
    p_fin = 1
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        p_in, p_stage = sched[i]
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        if p_stage == 1:
            x = nn.conv_transpose1d(params["ups"][i], x, stride=u,
                                    padding=(k - u) // 2)
        else:
            x = pc.packed_conv_transpose(params["ups"][i], x, k=k, u=u,
                                         pad=(k - u) // 2, P_in=p_in)
        p_fin = p_stage
        if har_source is not None:
            k_nc = params["noise_convs"][i]["w"].shape[0]
            if p_stage > 1:
                s_nc = k_nc // 2 if k_nc > 1 else 1
                x_source = pc.packed_strided_conv(
                    params["noise_convs_packed"][i], har_source,
                    k=k_nc, s=s_nc, P=p_stage)
                x = x + x_source[:, : x.shape[1]]
            else:
                ncp = params["noise_convs"][i]
                if k_nc == 1:
                    x_source = nn.conv1d(ncp, har_source)
                else:
                    stride_f0 = k_nc // 2
                    x_source = nn.conv1d(ncp, har_source, stride=stride_f0,
                                         padding=stride_f0 // 2)
                x = x + x_source[:, : x.shape[1]]
        xs = 0.0
        for j, (k_rb, d_rb) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
            blk = params["resblocks"][i][j]
            if p_stage == 1:
                xs = xs + (_resblock1(blk, x, k_rb, d_rb) if cfg.resblock == "1"
                           else _resblock2(blk, x, k_rb, d_rb))
            elif cfg.resblock == "1":
                xt0 = x
                for c1, c2, d in zip(blk["convs1"], blk["convs2"], d_rb):
                    xt = jax.nn.leaky_relu(xt0, LRELU_SLOPE)
                    xt = pc.packed_conv1d(c1, xt, k=k_rb, dilation=d,
                                          pad=(k_rb * d - d) // 2, P=p_stage)
                    xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
                    xt = pc.packed_conv1d(c2, xt, k=k_rb, dilation=1,
                                          pad=(k_rb - 1) // 2, P=p_stage)
                    xt0 = xt + xt0
                xs = xs + xt0
            else:
                xt0 = x
                for c, d in zip(blk["convs"], d_rb):
                    xt = jax.nn.leaky_relu(xt0, LRELU_SLOPE)
                    xt = pc.packed_conv1d(c, xt, k=k_rb, dilation=d,
                                          pad=(k_rb * d - d) // 2, P=p_stage)
                    xt0 = xt + xt0
                xs = xs + xt0
        x = xs / n_kernels
    x = jax.nn.leaky_relu(x)
    if p_fin == 1:
        k_post = params["conv_post"]["w"].shape[0]
        x = nn.conv1d(params["conv_post"], x, padding=(k_post - 1) // 2)
        y = x[:, :, 0]
    else:
        k_post = params["conv_post_plain"]["w"].shape[0]
        x = pc.packed_conv1d(params["conv_post"], x, k=k_post, dilation=1,
                             pad=(k_post - 1) // 2, P=p_fin)
        y = x.reshape(x.shape[0], x.shape[1] * p_fin)
    return jnp.tanh(y).astype(jnp.float32)


def tail_kernel_enabled(hp) -> bool:
    """``vocoder_pallas_tail`` hparam: on / off / auto (= on TPU).

    The fused Pallas tail (ops/pallas/vocoder_tail.py) subsumes the packed
    XLA path for single-stream serving: same packed tap matmuls, but with
    activations VMEM-resident across all ~56 tail convs instead of one HBM
    round trip each."""
    mode = str(hp.get("vocoder_pallas_tail", "auto")).lower()
    if mode in ("1", "true", "on", "yes"):
        return True
    if mode in ("0", "false", "off", "no", "none"):
        return False
    return jax.default_backend() == "tpu"


def _tail_prologue(plain, cfg: HifiGanConfig, mel, f0, rng, s0: int):
    """XLA prologue for the Pallas tail: conv_pre + stages 0..s0-1 in full
    + stage s0's leaky/ConvT/NSF-injection.  Returns (x [B,T_b,128],
    har_source or None)."""
    total_up = int(np.prod(cfg.upsample_rates))
    har_source = None
    if cfg.use_nsf and f0 is not None:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        f0_up = upsample_nearest(f0, total_up)
        har_source, _ = source_module(plain["m_source"], rng, f0_up,
                                      cfg.sampling_rate, cfg.harmonic_num)
    x = nn.conv1d(plain["conv_pre"], mel, padding=3)
    for i in range(s0 + 1):
        u, k = cfg.upsample_rates[i], cfg.upsample_kernel_sizes[i]
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = nn.conv_transpose1d(plain["ups"][i], x, stride=u,
                                padding=(k - u) // 2)
        if har_source is not None:
            ncp = plain["noise_convs"][i]
            k_nc = ncp["w"].shape[0]
            if k_nc == 1:
                x_source = nn.conv1d(ncp, har_source)
            else:
                stride_f0 = k_nc // 2
                x_source = nn.conv1d(ncp, har_source, stride=stride_f0,
                                     padding=stride_f0 // 2)
            x = x + x_source[:, : x.shape[1]]
        if i < s0:
            xs = 0.0
            for j, (k_rb, d_rb) in enumerate(zip(cfg.resblock_kernel_sizes,
                                                 cfg.resblock_dilation_sizes)):
                blk = plain["resblocks"][i][j]
                xs = xs + (_resblock1(blk, x, k_rb, d_rb)
                           if cfg.resblock == "1"
                           else _resblock2(blk, x, k_rb, d_rb))
            x = xs / len(cfg.resblock_kernel_sizes)
    return x, har_source


def apply_tail(tp: dict, cfg: HifiGanConfig, mel, f0=None, rng=None, *,
               plan, ts: int = 4096, interpret: bool = False):
    """Generator forward with the fused Pallas tail kernel.

    :param tp: {"plain": init-layout params, "packed": pack_params output,
        "wcat": [N,128,128] tap stack, "bcat": [n_convs,128]} — all passed
        as arguments so weights stay device-resident between calls.
    Numerics match :func:`apply_packed` to bf16-operand matmul accuracy on
    TPU (exactly XLA's default precision) and to fp32 in interpret mode.
    """
    from ..ops import packed_conv as pc
    from ..ops.pallas import vocoder_tail as vt

    assert mel.shape[0] == 1, "pallas tail is single-stream (B == 1)"
    plain, packed = tp["plain"], tp["packed"]
    sched = pack_schedule(cfg, 128)
    x, har_source = _tail_prologue(plain, cfg, mel, f0, rng, plan.s0)
    t_b = x.shape[1]
    slabs = [x[0]]
    if har_source is not None:
        for i in range(plan.s0 + 1, len(cfg.upsample_rates)):
            p_st = sched[i][1]
            ncp = plain["noise_convs"][i]
            k_nc = int(ncp["w"].shape[0])
            s_nc = k_nc // 2 if k_nc > 1 else 1
            xsrc = pc.packed_strided_conv(
                packed["noise_convs_packed"][i], har_source,
                k=k_nc, s=s_nc, P=p_st)
            slabs.append(xsrc[0, :t_b])
    # the kernel DMAs exactly plan.n_in slabs; an NSF plan run without f0
    # (spec2wav's no-f0 branch) must feed ZERO injections — adding zeros
    # matches apply_packed's skip-the-injection behavior exactly
    while len(slabs) < plan.n_in:
        slabs.append(jnp.zeros_like(slabs[0]))
    y = vt.tail(jnp.stack(slabs), tp["wcat"], tp["bcat"], plan, t_b=t_b,
                ts=ts, interpret=interpret)
    return y.reshape(1, t_b * plan.p_fin)


def build_tail_params(params, packed, cfg: HifiGanConfig,
                      lane_target: int = 128, weight_dtype=jnp.bfloat16):
    """(plan, tail-params pytree) for :func:`apply_tail`, or None when the
    config doesn't reach the uniform 128-lane tail layout."""
    from ..ops.pallas import vocoder_tail as vt

    built = vt.build_plan(params, packed, cfg, lane_target)
    if built is None:
        return None
    plan, wcat, bcat = built
    return plan, {"plain": params, "packed": packed,
                  "wcat": wcat.astype(weight_dtype), "bcat": bcat}


def setup_serving(wrapper, hp):
    """Attach the serving path to a vocoder wrapper holding .params/.cfg:
    sets .pack_lanes (0 = plain), .run_params (packed kernels when packing),
    and jitted ._apply / ._apply_nof0.  On TPU (or ``vocoder_channel_pack:
    on``) the C<128 tail stages run channel-packed as dense MXU matmuls
    (ops/packed_conv.py); parity tested in tests/test_packed_conv.py.
    On top of packing, ``vocoder_pallas_tail`` (auto = TPU) fuses the whole
    128-lane tail into one Pallas kernel (ops/pallas/vocoder_tail.py);
    parity tested in tests/test_vocoder_tail.py."""
    from ..ops.pallas import vocoder_tail as vt

    wrapper.pack_lanes = int(hp.get("vocoder_pack_lanes", 128) or 0) \
        if packing_enabled(hp) else 0
    cfg = wrapper.cfg
    wrapper.tail_plan = None
    if wrapper.pack_lanes:
        lanes = wrapper.pack_lanes
        wrapper.run_params = pack_params(wrapper.params, cfg, lanes)
        if tail_kernel_enabled(hp):
            built = build_tail_params(wrapper.params, wrapper.run_params,
                                      cfg, lanes)
            if built is not None and vt.supported(built[0], 1):
                plan, tail_params = built
                wrapper.tail_plan = plan
                wrapper.packed_params = wrapper.run_params
                wrapper.run_params = tail_params
                wrapper._apply = jax.jit(lambda p, m, f0, rng: apply_tail(
                    p, cfg, m, f0, rng, plan=plan))
                wrapper._apply_nof0 = jax.jit(lambda p, m: apply_tail(
                    p, cfg, m, plan=plan))
                return
        wrapper._apply = jax.jit(lambda p, m, f0, rng: apply_packed(
            p, cfg, m, f0, rng, lane_target=lanes))
        wrapper._apply_nof0 = jax.jit(lambda p, m: apply_packed(
            p, cfg, m, lane_target=lanes))
    else:
        wrapper.run_params = wrapper.params
        wrapper._apply = jax.jit(
            lambda p, m, f0, rng: apply(p, cfg, m, f0, rng))
        wrapper._apply_nof0 = jax.jit(lambda p, m: apply(p, cfg, m))


def apply(params, cfg: HifiGanConfig, mel: jnp.ndarray, f0=None, rng=None,
          dtype=None):
    """mel [B, T, M] (natural-log domain for NSF weights, matching how the
    wrappers feed it), f0 [B, T] in Hz. Returns wav [B, T*prod(rates)].

    ``dtype=jnp.bfloat16`` runs the conv stack in reduced precision (the
    NSF source phase accumulation stays float32); output is float32.
    """
    total_up = int(np.prod(cfg.upsample_rates))
    har_source = None
    if cfg.use_nsf and f0 is not None:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        f0_up = upsample_nearest(f0, total_up)
        har_source, _ = source_module(params["m_source"], rng, f0_up,
                                      cfg.sampling_rate, cfg.harmonic_num)
    return apply_conv_stack(params, cfg, mel, har_source, dtype=dtype)


def apply_conv_stack(params, cfg: HifiGanConfig, mel, har_source=None,
                     dtype=None):
    """The deterministic conv stack of :func:`apply` given a precomputed
    NSF source [B, L, 1] (or None for plain HiFi-GAN); shared with the
    ONNX export, where the source randomness enters as graph inputs."""
    if dtype is not None:
        params = jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, params)
        mel = mel.astype(dtype)
        if har_source is not None:
            har_source = har_source.astype(dtype)

    x = nn.conv1d(params["conv_pre"], mel, padding=3)
    n_kernels = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = nn.conv_transpose1d(params["ups"][i], x, stride=u, padding=(k - u) // 2)
        if har_source is not None:
            ncp = params["noise_convs"][i]
            k_nc = ncp["w"].shape[0]
            if k_nc == 1:
                x_source = nn.conv1d(ncp, har_source)
            else:
                stride_f0 = k_nc // 2
                x_source = nn.conv1d(ncp, har_source, stride=stride_f0,
                                     padding=stride_f0 // 2)
            x = x + x_source[:, : x.shape[1]]
        xs = 0.0
        for j, (k_rb, d_rb) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
            blk = params["resblocks"][i][j]
            if cfg.resblock == "1":
                xs = xs + _resblock1(blk, x, k_rb, d_rb)
            else:
                xs = xs + _resblock2(blk, x, k_rb, d_rb)
        x = xs / n_kernels
    x = jax.nn.leaky_relu(x)
    x = nn.conv1d(params["conv_post"], x,
                  padding=(params["conv_post"]["w"].shape[0] - 1) // 2)
    return jnp.tanh(x)[:, :, 0].astype(jnp.float32)
