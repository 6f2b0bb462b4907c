"""Sequence-parallel / sharded execution at PRODUCTION shapes (VERDICT r3 #5).

tests/test_seq_parallel.py and test_remat_sharded_infer.py prove the mesh
semantics at toy dims (t_mel=64, 16 channels).  These siblings run the
shapes multichip would actually be used for: T_mel >= 4096 (48 s of
44.1 kHz audio at hop 512), 384 residual channels x 20 layers with the
full dilation cycle (1,2,4,8 — halo = d*(k-1)/2 = 8 frames at the widest),
128 mel bins.  GSPMD must insert the halo exchanges for the dilated convs
and the all-gather for the mel2ph gather and still reproduce the
single-device numbers.

Slow-marked: a production fwd+bwd at T=4096 on the CPU test platform is a
multi-TFLOP graph — the training-parity test alone measures ~18 min on
the CPU host (XLA-CPU backward-conv cost + two GSPMD compiles), the other
two ~70 s and ~25 s. Deselect with ``-m 'not slow'`` for quick runs.

Depth is 8 layers = TWO full dilation cycles (1,2,4,8,1,2,4,8) rather
than production's 20 (five cycles): the sharding semantics under test —
halo width per dilation, cycle boundaries, the mel2ph gather — are
identical per cycle, while the XLA-CPU GSPMD compile of the 20-layer
T=4096 graph alone runs tens of CPU-minutes (measured r4), which is
test-suite-hostile for zero added coverage. Channel width (384), mel
bins (128), T (4096) and the vocoder/hubert dims are full production.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsvc_tpu.config import HParams
from diffsvc_tpu.models.diffusion import GaussianDiffusion
from diffsvc_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.slow

MEL = 128
CH = 384
LAYERS = 8
T_MEL = 4096
T_PH = 1024


def _hp(**kw):
    hp = HParams(
        audio_num_mel_bins=MEL, hidden_size=256, residual_layers=LAYERS,
        residual_channels=CH, dilation_cycle_length=4, timesteps=1000,
        K_step=1000, diff_loss_type="l2", schedule_type="linear",
        max_beta=0.02, keep_bins=MEL, spec_min=[-5.0], spec_max=[0.0],
        no_fs2=True, use_pitch_embed=True, use_energy_embed=False,
        use_uv=False, pitch_norm="log", f0_bin=256, f0_min=40.0,
        f0_max=1100.0, lr=1e-4, scheduler="step_lr", decay_steps=50000,
        optimizer_adam_beta1=0.9, optimizer_adam_beta2=0.98, weight_decay=0,
        clip_grad_norm=1, accumulate_grad_batches=1, seed=0,
        pndm_speedup=250,
    )
    hp.update(kw)
    return hp


def _batch(b=2, t_mel=T_MEL, t_ph=T_PH):
    rng = np.random.RandomState(0)
    mel2ph = np.clip((np.arange(t_mel)[None, :] * t_ph // t_mel) + 1, 1,
                     t_ph).astype(np.int32) * np.ones((b, 1), np.int32)
    f0 = np.log2(220.0) + 0.1 * np.sin(np.arange(t_mel) / 50.0)
    return {
        "hubert": (rng.randn(b, t_ph, 256) * 0.1).astype(np.float32),
        "mel2ph": mel2ph,
        "f0": np.broadcast_to(f0[None], (b, t_mel)).astype(np.float32).copy(),
        "uv": np.zeros((b, t_mel), np.float32),
        "energy": np.zeros((b, t_mel), np.float32),
        "mels": rng.randn(b, t_mel, MEL).astype(np.float32),
        "sample_mask": np.ones((b,), np.float32),
    }


def test_seq_parallel_training_prod_shapes():
    """(data=2, seq=4) training step at 384ch / T=4096 == single device.

    Each seq shard holds 1024 frames; the dilation-8 convs need 8-frame
    halos per boundary (SURVEY 5.7) — wrong halo handling shifts ~1.6% of
    frames, far above the tolerance here."""
    from diffsvc_tpu.training.task import SVCTask

    hp = _hp()
    batch = _batch()
    key = jax.random.PRNGKey(0)

    task1 = SVCTask(hp, mesh=None)
    state1 = task1.init_state()
    _, m1 = task1.train_step(state1, dict(batch), key)

    mesh = mesh_lib.make_mesh(("data", "seq"), shape=(2, 4))
    task2 = SVCTask(hp, mesh=mesh)
    state2 = task2.init_state()
    _, m2 = task2.train_step(state2, dict(batch), key)

    print(f"\n| prod-shape seq-parallel: loss {float(m1['loss']):.6f} vs "
          f"{float(m2['loss']):.6f}, grad_norm {float(m1['grad_norm']):.4f} "
          f"vs {float(m2['grad_norm']):.4f}")
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-3)


def test_sharded_remat_inference_prod_shapes():
    """Batch/time-sharded + remat PLMS sampling at production dims equals
    the single-device mel (speedup 250 bounds the ladder to 4 scan steps —
    per-step shapes and halo structure are identical to production
    serving)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    hp = _hp(use_remat=True)
    model = GaussianDiffusion(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    batch_np = _batch(b=2)
    batch_np.pop("sample_mask")
    key = jax.random.PRNGKey(1)

    infer = jax.jit(
        lambda p, b, r: model.infer(p, b, r, speedup=250)["mel_out"])
    ref = np.asarray(infer(params, {k: jnp.asarray(v)
                                    for k, v in batch_np.items()}, key))

    mesh = mesh_lib.make_mesh(("data", "seq"), shape=(2, 4))
    spec3 = NamedSharding(mesh, P("data", "seq", None))
    spec2 = NamedSharding(mesh, P("data", "seq"))
    sharded = {
        "hubert": jax.device_put(batch_np["hubert"], spec3),
        "mels": jax.device_put(batch_np["mels"], spec3),
        "mel2ph": jax.device_put(batch_np["mel2ph"], spec2),
        "f0": jax.device_put(batch_np["f0"], spec2),
        "uv": jax.device_put(batch_np["uv"], spec2),
        "energy": jax.device_put(batch_np["energy"], spec2),
    }
    out = np.asarray(infer(params, sharded, key))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_fused_sharded_serving_prod_dims():
    """Data-sharded fused serving at production widths (384-ch denoiser,
    128 mel, NSF-HiFiGAN at openvpi dims, full-size HuBERT, 44.1 kHz) must
    equal the single-device batched output chunk-for-chunk."""
    from types import SimpleNamespace

    from diffsvc_tpu.infer.fused import FusedSvc
    from diffsvc_tpu.models import hubert as hub
    from diffsvc_tpu.vocoders import generator as gen

    hp = _hp()
    hp.update(audio_sample_rate=44100, fft_size=2048, hop_size=512,
              win_size=2048, fmin=40, fmax=16000, vocoder="nsf_hifigan",
              mel_vmin=-6.0, mel_vmax=1.5, use_nsf=True,
              fused_bucket_samples=32768, pndm_speedup=250)
    model = GaussianDiffusion(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    hcfg = hub.HubertConfig()  # full-size HuBERT, the production encoder
    hpar = hub.init(jax.random.PRNGKey(1), hcfg)
    vcfg = gen.HifiGanConfig(
        num_mels=MEL, upsample_initial_channel=512,
        upsample_rates=(8, 8, 2, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4, 4),
        resblock="1", resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3, sampling_rate=44100,
        use_nsf=True)
    voc = SimpleNamespace(params=gen.init(jax.random.PRNGKey(2), vcfg),
                          cfg=vcfg)
    fused = FusedSvc(hp, params, voc, hubert_params=hpar, hubert_cfg=hcfg,
                     speedup=250)

    rng = np.random.RandomState(3)
    chunks = []
    for i in range(4):
        ln = int(rng.randint(22000, 32768))
        t = np.arange(ln) / 44100
        chunks.append((0.3 * np.sin(2 * np.pi * (196 + 30 * i) * t))
                      .astype(np.float32))

    ref = fused.batched(chunks, rng=jax.random.PRNGKey(9))
    mesh = mesh_lib.make_mesh(("data", "seq"), shape=(4, 2))
    out = fused.batched_sharded(chunks, mesh, rng=jax.random.PRNGKey(9))
    assert len(out) == len(ref) == 4
    for (w_s, f_s, m_s), (w_r, f_r, m_r) in zip(out, ref):
        np.testing.assert_allclose(np.asarray(w_s), np.asarray(w_r),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_r),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_r),
                                   atol=1e-4, rtol=1e-4)
