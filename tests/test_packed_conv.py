"""Parity tests for space-to-depth packed convolutions (ops/packed_conv.py)
and the channel-packed HiFi-GAN path (vocoders/generator.apply_packed).

The packed path must be numerically identical (up to fp32 accumulation
order) to the plain path for any mel length, both resblock types, and
NSF on/off — it is the TPU serving fast path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsvc_tpu.models import nn
from diffsvc_tpu.ops import packed_conv as pc
from diffsvc_tpu.vocoders import generator as gen


def test_pack_unpack_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 24, 3), jnp.float32)
    assert pc.unpack(pc.pack(x, 4), 4).shape == x.shape
    np.testing.assert_array_equal(pc.unpack(pc.pack(x, 4), 4), x)
    # packed block t' holds samples t'*P .. t'*P+P-1
    xp = pc.pack(x, 4)
    np.testing.assert_array_equal(xp[0, 1, :3], x[0, 4, :])
    np.testing.assert_array_equal(xp[0, 1, 9:12], x[0, 7, :])


@pytest.mark.parametrize("k,d,P,ci,co", [
    (3, 1, 2, 4, 4), (3, 1, 8, 2, 2), (7, 3, 4, 3, 5),
    (11, 5, 8, 2, 2), (1, 1, 4, 3, 3), (5, 2, 2, 4, 1),
])
def test_packed_conv1d_matches_plain(k, d, P, ci, co):
    rng = np.random.RandomState(1)
    T = 48
    x = jnp.asarray(rng.randn(2, T, ci), jnp.float32)
    p = {"w": jnp.asarray(rng.randn(k, ci, co), jnp.float32),
         "b": jnp.asarray(rng.randn(co), jnp.float32)}
    pad = (k * d - d) // 2
    ref = nn.conv1d(p, x, dilation=d, padding=pad)
    pp = pc.pack_conv1d(p, P, d, pad)
    got = pc.unpack(pc.packed_conv1d(pp, pc.pack(x, P), k=k, dilation=d,
                                     pad=pad, P=P), P)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,u,P_in,ci,co", [
    (16, 8, 1, 6, 3), (4, 2, 1, 4, 4), (4, 2, 2, 4, 2),
    (4, 2, 4, 2, 2), (8, 4, 2, 3, 3),
])
def test_packed_conv_transpose_matches_plain(k, u, P_in, ci, co):
    rng = np.random.RandomState(2)
    T = 24 * P_in
    x = jnp.asarray(rng.randn(2, T, ci), jnp.float32)
    p = {"w": jnp.asarray(rng.randn(k, co, ci), jnp.float32),
         "b": jnp.asarray(rng.randn(co), jnp.float32)}
    pad = (k - u) // 2
    ref = nn.conv_transpose1d(p, x, stride=u, padding=pad)
    pp = pc.pack_conv_transpose(p, P_in, u, pad)
    got = pc.unpack(pc.packed_conv_transpose(pp, pc.pack(x, P_in), k=k, u=u,
                                             pad=pad, P_in=P_in), P_in * u)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pack_schedule_real_configs():
    # 44.1 kHz NSF profile: 512ch, rates (8,8,2,2,2) -> C 256,128,64,32,16
    cfg = gen.HifiGanConfig(upsample_initial_channel=512,
                            upsample_rates=(8, 8, 2, 2, 2),
                            upsample_kernel_sizes=(16, 16, 4, 4, 4))
    sched = gen.pack_schedule(cfg, 128)
    assert sched == ((1, 1), (1, 1), (1, 2), (2, 4), (4, 8))
    # every packed stage reaches exactly the 128-lane tile
    for i, (_, p_out) in enumerate(sched):
        if p_out > 1:
            assert gen._stage_channels(cfg, i) * p_out == 128
    # 24 kHz profile: rates (8,8,2,2) -> C 256,128,64,32
    cfg24 = gen.HifiGanConfig(upsample_rates=(8, 8, 2, 2),
                              upsample_kernel_sizes=(16, 16, 4, 4))
    assert gen.pack_schedule(cfg24, 128) == ((1, 1), (1, 1), (1, 2), (2, 4))
    # lane_target 0 disables packing entirely
    assert all(s == (1, 1) for s in gen.pack_schedule(cfg, 0))


def test_pack_schedule_reaches_target_once_started():
    # invariant the schedule relies on: once packing starts, C*P never
    # shrinks (channels halve, rates >= 2), so every packed stage holds
    # C*P >= lane_target
    for lanes in (16, 32, 64, 128, 256):
        cfg = gen.HifiGanConfig(upsample_initial_channel=512,
                                upsample_rates=(8, 8, 2, 2, 2),
                                upsample_kernel_sizes=(16, 16, 4, 4, 4))
        for i, (_, p_out) in enumerate(gen.pack_schedule(cfg, lanes)):
            c = gen._stage_channels(cfg, i)
            if p_out > 1:
                assert c * p_out >= min(lanes, 2 * c)


def _tiny_cfg(resblock="1", use_nsf=False):
    return gen.HifiGanConfig(
        num_mels=8, upsample_initial_channel=16,
        upsample_rates=(4, 2, 2), upsample_kernel_sizes=(8, 4, 4),
        resblock=resblock, resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        sampling_rate=8000, use_nsf=use_nsf)


@pytest.mark.parametrize("resblock,use_nsf,lanes", [
    ("1", False, 16), ("2", False, 16), ("1", True, 16), ("1", True, 32),
])
def test_apply_packed_matches_apply(resblock, use_nsf, lanes):
    cfg = _tiny_cfg(resblock, use_nsf)
    params = gen.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    mel = jnp.asarray(rng.randn(2, 20, cfg.num_mels), jnp.float32)
    f0 = jnp.asarray(np.abs(rng.randn(2, 20)) * 200 + 100, jnp.float32) \
        if use_nsf else None
    key = jax.random.PRNGKey(7)
    ref = gen.apply(params, cfg, mel, f0, key)
    packed = gen.pack_params(params, cfg, lanes)
    got = gen.apply_packed(packed, cfg, mel, f0, key, lane_target=lanes)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_apply_packed_identity_when_disabled():
    cfg = _tiny_cfg()
    params = gen.init(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(np.random.RandomState(4).randn(1, 12, 8), jnp.float32)
    ref = gen.apply(params, cfg, mel)
    packed = gen.pack_params(params, cfg, 0)
    got = gen.apply_packed(packed, cfg, mel, lane_target=0)
    np.testing.assert_array_equal(got, ref)


def test_apply_packed_bf16_close_to_plain_bf16():
    cfg = _tiny_cfg("1", True)
    params = gen.init(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(5)
    mel = jnp.asarray(rng.randn(1, 16, 8), jnp.float32)
    f0 = jnp.asarray(np.abs(rng.randn(1, 16)) * 200 + 100, jnp.float32)
    key = jax.random.PRNGKey(9)
    ref = gen.apply(params, cfg, mel, f0, key, dtype=jnp.bfloat16)
    packed = gen.pack_params(params, cfg, 16)
    got = gen.apply_packed(packed, cfg, mel, f0, key, dtype=jnp.bfloat16,
                           lane_target=16)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(got, ref, rtol=0.1, atol=0.05)


def test_packed_strided_conv_matches_plain():
    """pack_strided_conv: the NSF noise-conv downsample (k=2s, pad=s//2 and
    the k=1 variant) applied in packed layout must equal conv -> pack."""
    import jax
    import jax.numpy as jnp

    from diffsvc_tpu.models import nn
    from diffsvc_tpu.ops import packed_conv as pc

    rng = np.random.RandomState(5)
    for s, P, C in [(4, 2, 64), (2, 4, 32), (1, 8, 16), (8, 2, 32)]:
        k = 2 * s if s > 1 else 1
        L = 64 * P * s
        har = jnp.asarray(rng.randn(2, L, 1).astype(np.float32))
        p = nn.init_conv1d(jax.random.PRNGKey(0), k, 1, C)
        if k == 1:
            ref = nn.conv1d(p, har)
        else:
            ref = nn.conv1d(p, har, stride=s, padding=s // 2)
        ref_packed = pc.pack(ref, P)
        pp = pc.pack_strided_conv(p, P, s)
        got = pc.packed_strided_conv(pp, har, k=k, s=s, P=P)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref_packed),
                                   rtol=1e-5, atol=1e-5)


def test_apply_packed_nondefault_conv_post_kernel():
    """apply_packed must honor the checkpoint's actual conv_post kernel
    width (regression: it was hardcoded to the v1 default of 7)."""
    import jax
    import jax.numpy as jnp

    from diffsvc_tpu.models import nn
    from diffsvc_tpu.vocoders import generator as gen

    cfg = gen.HifiGanConfig(
        num_mels=16, upsample_initial_channel=32,
        upsample_rates=(4, 2, 2), upsample_kernel_sizes=(8, 4, 4),
        resblock="1", resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), sampling_rate=8000, use_nsf=False)
    params = gen.init(jax.random.PRNGKey(0), cfg)
    # swap in a width-5 output conv
    params["conv_post"] = nn.init_conv1d(jax.random.PRNGKey(9), 5,
                                         params["conv_post"]["w"].shape[1], 1)
    mel = jnp.asarray(np.random.RandomState(0)
                      .randn(1, 32, 16).astype(np.float32))
    ref = gen.apply(params, cfg, mel)
    packed = gen.pack_params(params, cfg, 16)
    got = gen.apply_packed(packed, cfg, mel, lane_target=16)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_pack_lanes_without_run_params_raises():
    """A vocoder wrapper with pack_lanes set but no packed run_params must
    fail loudly, not trace unpacked weights through packed conv spans."""
    from types import SimpleNamespace

    from diffsvc_tpu.infer.fused import FusedSvc

    voc = SimpleNamespace(params={}, cfg=None, pack_lanes=128)
    fused = FusedSvc.__new__(FusedSvc)
    fused.vocoder = voc
    with pytest.raises(AttributeError, match="run_params"):
        fused._voc_run_params()
