"""Fused single-dispatch inference graph: correctness of the device-side
glue (align, interp, key shift) and end-to-end execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from types import SimpleNamespace

from diffsvc_tpu.config import HParams
from diffsvc_tpu.infer.fused import (FusedSvc, align_uniform_device,
                                     norm_interp_f0_device)
from diffsvc_tpu.data.features import get_align_uniform
from diffsvc_tpu.ops.pitch import norm_interp_f0_np


def test_align_uniform_device_matches_host():
    for mel_len, n_units in [(10, 5), (100, 37), (257, 64), (7, 7)]:
        host = get_align_uniform(mel_len, n_units)
        dev = np.asarray(align_uniform_device(mel_len, n_units))
        np.testing.assert_array_equal(dev, host)


def test_norm_interp_device_matches_host():
    f0 = np.array([0, 220, 0, 0, 440, 0, 330, 0], np.float32)
    h_f0, h_uv = norm_interp_f0_np(f0)
    d_f0, d_uv = norm_interp_f0_device(jnp.asarray(f0))
    np.testing.assert_array_equal(np.asarray(d_uv), h_uv)
    np.testing.assert_allclose(np.asarray(d_f0), h_f0, rtol=1e-5)


def test_norm_interp_device_all_unvoiced():
    d_f0, d_uv = norm_interp_f0_device(jnp.zeros(6))
    assert (np.asarray(d_f0) == 0).all()
    assert (np.asarray(d_uv) == 1).all()


@pytest.fixture(scope="module")
def fused_model():
    from diffsvc_tpu.models.diffusion import GaussianDiffusion
    from diffsvc_tpu.models import hubert as hub
    from diffsvc_tpu.vocoders import generator as gen

    hp = HParams(
        audio_sample_rate=8000, audio_num_mel_bins=16, fft_size=256,
        hop_size=64, win_size=256, fmin=30, fmax=4000, wav2spec_eps=1e-6,
        hidden_size=32, residual_layers=4, residual_channels=16,
        dilation_cycle_length=4, timesteps=20, K_step=20, diff_loss_type="l2",
        schedule_type="linear", max_beta=0.02, keep_bins=16,
        spec_min=[-6.0], spec_max=[1.5], no_fs2=True, use_pitch_embed=True,
        use_energy_embed=False, use_uv=False, pitch_norm="log", f0_bin=256,
        f0_min=50.0, f0_max=1100.0, pndm_speedup=5, vocoder="hifigan",
        mel_vmin=-6.0, mel_vmax=1.5)
    model = GaussianDiffusion(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    hcfg = hub.HubertConfig(dim=32, num_heads=4, num_layers=1, ffn_dim=64,
                            proj_dim=32)
    hp_ = hub.init(jax.random.PRNGKey(1), hcfg)
    vcfg = gen.HifiGanConfig(
        num_mels=16, upsample_initial_channel=32, upsample_rates=(4, 4, 4),
        upsample_kernel_sizes=(8, 8, 8), resblock="1",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        sampling_rate=8000, use_nsf=False)
    voc = SimpleNamespace(params=gen.init(jax.random.PRNGKey(2), vcfg), cfg=vcfg)
    return FusedSvc(hp, params, voc, hubert_params=hp_, hubert_cfg=hcfg,
                    speedup=5)


def test_fused_end_to_end(fused_model):
    t = np.arange(8000) / 8000
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav_out, f0, mel = fused_model(wav)
    assert np.isfinite(np.asarray(wav_out)).all()
    v = np.asarray(f0)
    assert abs(np.median(v[v > 0]) - 220.0) < 5


def test_fused_bf16_close_to_fp32(fused_model):
    """bf16 compute (denoiser/vocoder/hubert in bfloat16, sampler math fp32)
    is the recommended TPU serving mode — its mel must stay close to fp32."""
    hp2 = fused_model.hp.copy()
    hp2["diff_compute_dtype"] = "bfloat16"
    hp2["voc_compute_dtype"] = "bfloat16"
    hp2["hubert_compute_dtype"] = "bfloat16"
    fused_bf16 = FusedSvc(hp2, fused_model.params, fused_model.vocoder,
                          hubert_params=fused_model.hub_params,
                          hubert_cfg=fused_model.hub_cfg, speedup=5)
    t = np.arange(8000) / 8000
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav32, f0_32, mel32 = fused_model(wav)
    wav16, f0_16, mel16 = fused_bf16(wav)
    assert np.isfinite(np.asarray(wav16)).all()
    np.testing.assert_array_equal(np.asarray(f0_16), np.asarray(f0_32))
    m32, m16 = np.asarray(mel32), np.asarray(mel16)
    # log10-mel spans ~[-6, 1.5]; bf16 rounding through 4 NFEs stays small
    assert np.abs(m16 - m32).mean() < 0.05, np.abs(m16 - m32).mean()
    assert np.abs(m16 - m32).max() < 0.5, np.abs(m16 - m32).max()


def test_fused_int16_input_wire(fused_model):
    """fused_input_int16 (int16 input wire): a float input that already
    sits on the int16 grid must produce EXACTLY the float-graph result
    (decode is x * 1/32767, the inverse of to_int16 on that grid), and
    passing the int16 array directly is identical to the flag path."""
    t = np.arange(8000) / 8000
    wav_i16 = FusedSvc.to_int16((0.4 * np.sin(2 * np.pi * 220 * t))
                                .astype(np.float32))
    wav = FusedSvc.to_float(wav_i16)  # float32 exactly on the int16 grid

    ref_wav, ref_f0, ref_mel = fused_model(wav)

    hp2 = fused_model.hp.copy()
    hp2["fused_input_int16"] = True
    f_wire = FusedSvc(hp2, fused_model.params, fused_model.vocoder,
                      hubert_params=fused_model.hub_params,
                      hubert_cfg=fused_model.hub_cfg, speedup=5)
    out_flag = f_wire(wav)          # host-side quantize -> int16 upload
    out_direct = f_wire(wav_i16)    # caller already holds PCM16
    for a, b in zip(out_flag, out_direct):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(out_flag[0]),
                                  np.asarray(ref_wav))
    np.testing.assert_array_equal(np.asarray(out_flag[2]),
                                  np.asarray(ref_mel))

    # batched path uses the same wire (vs the float batched graph — the
    # batched rng split differs from the single-call rng, so compare
    # like-for-like)
    chunks_f = [wav, wav[: len(wav) // 2]]
    outs_ref = fused_model.batched(chunks_f)
    outs = f_wire.batched([wav_i16, wav_i16[: len(wav_i16) // 2]])
    for (a, _, _), (b, _, _) in zip(outs, outs_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_key_shift(fused_model):
    t = np.arange(8000) / 8000
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    _, f0_up, _ = fused_model(wav, key_shift=12)
    v = np.asarray(f0_up)
    # +12 semitones -> vocoder f0 doubled
    assert abs(np.median(v[v > 0]) - 440.0) < 10


def test_device_resampler_matches_scipy():
    """ops/resample must match scipy.signal.resample_poly (the host path in
    utils/audio_io.py and the reference's resampy call,
    data_gen_utils.py:195) to fp32 accuracy, including odd lengths."""
    from scipy.signal import resample_poly

    from diffsvc_tpu.ops.resample import resample_length, resample_poly_device

    rng = np.random.RandomState(0)
    for n, pair in [(44100, (44100, 16000)), (44101, (44100, 16000)),
                    (12345, (44100, 16000)), (24000, (24000, 16000))]:
        x = rng.randn(n)
        import math
        g = math.gcd(*pair)
        ref = resample_poly(x, pair[1] // g, pair[0] // g).astype(np.float32)
        got = np.asarray(resample_poly_device(x.astype(np.float32), *pair))
        assert got.shape == ref.shape == (resample_length(n, *pair),)
        np.testing.assert_allclose(got, ref, atol=3e-5)


def test_fused_batched_matches_sequential(fused_model):
    """FusedSvc.batched (one vmapped dispatch over N chunks) must agree
    with per-chunk calls; shorter chunks are padded to the longest and
    trimmed back."""
    sr = 8000
    t = np.arange(sr) / sr
    w1 = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    w2 = (0.3 * np.sin(2 * np.pi * 330 * t[: int(0.7 * sr)])).astype(np.float32)

    rng = jax.random.PRNGKey(5)
    rngs = jax.random.split(rng, 2)
    outs = fused_model.batched([w1, w2], rng=rng, key_shifts=[0, 2])

    for i, (w, ks) in enumerate([(w1, 0), (w2, 2)]):
        # the batched path pads chunk i to the longest length; reproduce
        # that padding for the sequential reference call
        wp = np.zeros(len(w1), np.float32)
        wp[: len(w)] = w
        ref_w, ref_f0, ref_mel = fused_model(wp, rng=rngs[i], key_shift=ks)
        bw, bf0, bm = outs[i]
        t_true = -(-len(w) // 64)
        np.testing.assert_allclose(np.asarray(bw), np.asarray(ref_w)[: len(w)],
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(bf0),
                                   np.asarray(ref_f0)[:t_true], atol=1e-3)
        np.testing.assert_allclose(np.asarray(bm),
                                   np.asarray(ref_mel)[:t_true], atol=2e-4)


def test_fused_packed_vocoder_matches_plain(fused_model):
    """Fused graph with a channel-packed vocoder (vocoder_channel_pack path,
    ops/packed_conv.py) must reproduce the plain fused output."""
    from diffsvc_tpu.vocoders import generator as gen

    t = np.arange(8000) / 8000
    wav = (0.4 * np.sin(2 * np.pi * 196 * t)).astype(np.float32)
    ref_wav, _, ref_mel = fused_model(wav)

    voc = fused_model.vocoder
    lanes = 32  # pack the tiny test channels (32 -> 16,8,4)
    packed_voc = SimpleNamespace(
        cfg=voc.cfg, params=voc.params, pack_lanes=lanes,
        run_params=gen.pack_params(voc.params, voc.cfg, lanes))
    fused_packed = FusedSvc(dict(fused_model.hp), fused_model.params,
                            packed_voc, hubert_params=fused_model.hub_params,
                            hubert_cfg=fused_model.hub_cfg, speedup=5)
    # the packed path reads pack_lanes as its lane target
    fused_packed.vocoder.pack_lanes = lanes
    got_wav, _, got_mel = fused_packed(wav)
    np.testing.assert_allclose(np.asarray(got_mel), np.asarray(ref_mel),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_wav), np.asarray(ref_wav),
                               rtol=1e-4, atol=1e-5)


def test_key_shift_property(fused_model):
    """Key transpose property (reference infer_tool.py:149-150): +12
    semitones doubles the conditioner's denormalized f0; a shift past the
    f0_max ceiling zeroes the log2 value, which denorm_f0 maps to 2**0 =
    1.0 Hz (the reference quirk, utils/pitch_utils.py:63-76 with
    use_uv=False — deliberately preserved)."""
    t = np.arange(8000) / 8000
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    _, f0_0, _ = fused_model(wav, key_shift=0)
    _, f0_12, _ = fused_model(wav, key_shift=12)
    _, f0_36, _ = fused_model(wav, key_shift=36)
    f0_0, f0_12, f0_36 = (np.asarray(a) for a in (f0_0, f0_12, f0_36))
    v = f0_0 > 10.0
    assert v.sum() > 20
    np.testing.assert_allclose(f0_12[v], 2.0 * f0_0[v], rtol=1e-4)
    # 220 * 2**3 = 1760 > f0_max 1100 -> ceiling zeroing -> denorm == 1 Hz
    np.testing.assert_allclose(f0_36[v], 1.0, rtol=1e-5)


def test_bucket_set_bounded(fused_model):
    """fused_bucket_samples bounds the compiled-program set: many distinct
    buffer lengths must collapse onto ceil(len/bucket) buckets (the
    realtime/DAW serving requirement — reference flask_api.py streams
    arbitrary short buffers)."""
    from diffsvc_tpu.config import HParams

    hp2 = HParams(**{**fused_model.hp, "fused_bucket_samples": 2048})
    fs = FusedSvc(hp2, fused_model.params, fused_model.vocoder,
                  hubert_params=fused_model.hub_params,
                  hubert_cfg=fused_model.hub_cfg, speedup=5)
    rng = np.random.RandomState(0)
    lens = [int(x) for x in rng.randint(1500, 8192, size=10)]
    for i, n in enumerate(lens):
        t = np.arange(n) / 8000
        wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        wav_out, _, _ = fs(wav)
        assert len(np.asarray(wav_out)) == n   # trimmed to true length
    buckets = {k for k in fs._fns if not isinstance(k, tuple)}
    assert buckets <= {2048 * m for m in range(1, 5)}
    assert len(buckets) <= 4


def test_int16_output_mode(fused_model):
    """fused_output_int16 serves the int16 wire format from the device;
    decoded output must match the float path to 1 LSB (1/32767)."""
    from diffsvc_tpu.config import HParams

    t = np.arange(6000) / 8000
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    ref_w, _, ref_m = fused_model(wav, rng=jax.random.PRNGKey(5))

    hp2 = HParams(**{**fused_model.hp, "fused_output_int16": True})
    fs = FusedSvc(hp2, fused_model.params, fused_model.vocoder,
                  hubert_params=fused_model.hub_params,
                  hubert_cfg=fused_model.hub_cfg, speedup=5)
    got_w, _, got_m = fs(wav, rng=jax.random.PRNGKey(5))
    assert np.asarray(got_w).dtype == np.int16
    dec = FusedSvc.to_float(got_w)
    np.testing.assert_allclose(dec, np.clip(np.asarray(ref_w), -1, 1),
                               atol=1.01 / 32767)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m))


def test_fused_istft_vocoder(fused_model):
    """vocoder: istftvocoder routes the fused epilogue through the
    iSTFT-head family (NSF mel geometry, log10-mel input, f0 embedding);
    the fused waveform must equal the head applied standalone on the
    fused graph's own mel/f0."""
    from diffsvc_tpu.vocoders import istft_head as ih

    hp2 = fused_model.hp.copy()
    hp2["vocoder"] = "istftvocoder"
    hp2["use_nsf"] = True
    hp2["istft_dim"] = 64
    hp2["istft_layers"] = 2
    icfg = ih.IstftVocoderConfig.from_hparams(hp2)
    iparams = ih.init(jax.random.PRNGKey(5), icfg)
    voc = SimpleNamespace(params=iparams, cfg=icfg)
    fused = FusedSvc(hp2, fused_model.params, voc,
                     hubert_params=fused_model.hub_params,
                     hubert_cfg=fused_model.hub_cfg, speedup=5)
    t = np.arange(8000) / 8000
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav_out, f0, mel = fused(wav)
    w = np.asarray(wav_out)
    assert np.isfinite(w).all()
    assert w.shape[0] == np.asarray(mel).shape[0] * hp2["hop_size"]
    want = np.asarray(ih.apply(iparams, icfg, jnp.asarray(mel)[None],
                               jnp.asarray(f0)[None])[0])
    np.testing.assert_allclose(w, want, rtol=1e-5, atol=1e-6)


def test_fused_dpmpp_sampler(fused_model):
    """sampler: dpmpp flows from hp through the fused graph (model.infer
    reads it lazily at trace time): output must be finite, pitch-preserving,
    and DIFFERENT from the PLMS trajectory on the same rng."""
    t = np.arange(8000) / 8000
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    plms_w, _, plms_m = fused_model(wav, rng=jax.random.PRNGKey(7))

    hp2 = HParams(**{**fused_model.hp, "sampler": "dpmpp"})
    fs = FusedSvc(hp2, fused_model.params, fused_model.vocoder,
                  hubert_params=fused_model.hub_params,
                  hubert_cfg=fused_model.hub_cfg, speedup=5)
    got_w, f0, got_m = fs(wav, rng=jax.random.PRNGKey(7))
    assert np.isfinite(np.asarray(got_w)).all()
    v = np.asarray(f0)
    assert abs(np.median(v[v > 0]) - 220.0) < 5
    assert not np.array_equal(np.asarray(got_m), np.asarray(plms_m))


def test_fused_gt_mel_shallow_diffusion(fused_model):
    """use_gt_mel (the reference's shallow-diffusion flags, infer.py
    run_clip -> diffusion.py:270-276) through the FUSED graph: at a tiny
    add_noise_step the trajectory starts from the input's own (barely
    noised) mel, so the output mel must hug the input mel where the
    standard full-noise run (random weights) lands far away."""
    from diffsvc_tpu.ops import mel as mel_ops

    hp = fused_model.hp
    t = np.arange(8000) / 8000
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    _, _, mel_std = fused_model(wav, rng=jax.random.PRNGKey(3))
    _, f0_gt, mel_gt = fused_model(wav, rng=jax.random.PRNGKey(3),
                                   use_gt_mel=True, add_noise_step=1)
    mel_in = np.asarray(mel_ops.wav2mel_pwg(
        jnp.asarray(wav), sr=hp["audio_sample_rate"], n_fft=hp["fft_size"],
        hop=hp["hop_size"], win_length=hp["win_size"],
        n_mels=hp["audio_num_mel_bins"], fmin=float(hp["fmin"]),
        fmax=float(hp["fmax"]), eps=float(hp["wav2spec_eps"])))
    mel_in = np.clip(mel_in[: np.asarray(mel_gt).shape[0]],
                     hp["mel_vmin"], hp["mel_vmax"])
    err_gt = np.abs(np.asarray(mel_gt) - mel_in).mean()
    err_std = np.abs(np.asarray(mel_std) - mel_in).mean()
    assert np.isfinite(np.asarray(mel_gt)).all()
    assert err_gt < 0.5, err_gt
    assert err_std > 2 * err_gt, (err_std, err_gt)
    v = np.asarray(f0_gt)
    assert abs(np.median(v[v > 0]) - 220.0) < 5
    # distinct ladder lengths => distinct compiled graphs, bounded cache
    assert ("gt_mel", len(wav), 1) in fused_model._fns


def test_fused_hp_snapshot_isolated(fused_model):
    """FusedSvc must snapshot hp at construction: mutating the caller's
    dict afterwards (or constructing a sibling with a compute_dtype
    override) must not change what a lazily-traced instance compiles."""
    hp = HParams(dict(fused_model.hp))
    voc = fused_model.vocoder
    a = FusedSvc(hp, fused_model.params, voc,
                 hubert_params=fused_model.hub_params,
                 hubert_cfg=fused_model.hub_cfg, speedup=5)
    # sibling with an override must not leak into the shared dict...
    FusedSvc(hp, fused_model.params, voc,
             hubert_params=fused_model.hub_params,
             hubert_cfg=fused_model.hub_cfg, speedup=5,
             compute_dtype="bfloat16")
    assert "diff_compute_dtype" not in hp or \
        hp.get("diff_compute_dtype") != "bfloat16"
    # ...and direct caller mutation must not reach the snapshot
    hp["fused_output_int16"] = True
    assert not a.hp.get("fused_output_int16", False)
    # the snapshot preserves the hp type (HParams attribute access)
    assert type(a.hp) is type(hp)
