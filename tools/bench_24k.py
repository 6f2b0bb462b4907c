"""24 kHz profile (config #1 dims) fused-serving RTF on one TPU chip.

Measured: RTF 0.0105 (bf16 denoiser via the Pallas stack + channel-packed
fp32 HiFi-GAN), vs 0.015 fp32 in round 1. Usage: python tools/bench_24k.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from diffsvc_tpu.utils.compile_cache import enable as _cc
_cc()
from types import SimpleNamespace
from diffsvc_tpu.config import HParams
from diffsvc_tpu.models import hubert as hubert_model
from diffsvc_tpu.models.diffusion import GaussianDiffusion
from diffsvc_tpu.vocoders import generator as gen
from diffsvc_tpu.infer.fused import FusedSvc

log = lambda *a: print(*a, file=sys.stderr, flush=True)
SR, SECS, HOP, NFFT, NMEL, SPEEDUP = 24000, 10.0, 128, 512, 80, 20
hp = HParams(
    audio_sample_rate=SR, audio_num_mel_bins=NMEL, fft_size=NFFT,
    hop_size=HOP, win_size=NFFT, fmin=55, fmax=12000,
    hidden_size=256, residual_layers=20, residual_channels=256,
    dilation_cycle_length=4, timesteps=1000, K_step=1000,
    diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
    keep_bins=NMEL, spec_min=[-5.0], spec_max=[0.0], no_fs2=True,
    use_pitch_embed=True, use_energy_embed=False, use_spk_id=False,
    use_spk_embed=False, use_uv=False, pitch_norm="log", f0_bin=256,
    f0_min=40.0, f0_max=1100.0, pndm_speedup=SPEEDUP,
    vocoder="hifigan", use_nsf=True,
    diff_compute_dtype="bfloat16", hubert_compute_dtype="bfloat16",
    voc_compute_dtype="", vocoder_channel_pack="on",
)
t = np.arange(int(SR * SECS)) / SR
wav = (0.35 * np.sin(2*np.pi*220*t) + 0.1*np.sin(2*np.pi*440*t)).astype(np.float32)
model = GaussianDiffusion(hp)
params = model.init_params(jax.random.PRNGKey(0))
hub_cfg = hubert_model.HubertConfig()
hub_params = hubert_model.init(jax.random.PRNGKey(1), hub_cfg)
# 24k HiFi-GAN v1 (reference 0109 model dims: 128 mel hop -> rates 8,8,2)
voc_cfg = gen.HifiGanConfig(
    num_mels=NMEL, upsample_initial_channel=512,
    upsample_rates=(8, 8, 2), upsample_kernel_sizes=(16, 16, 4),
    resblock="1", resblock_kernel_sizes=(3, 7, 11),
    resblock_dilation_sizes=((1, 3, 5),) * 3, sampling_rate=SR, use_nsf=True)
voc_params = gen.init(jax.random.PRNGKey(2), voc_cfg)
voc = SimpleNamespace(params=voc_params, cfg=voc_cfg, pack_lanes=128,
                      run_params=gen.pack_params(voc_params, voc_cfg, 128))
fused = FusedSvc(hp, params, voc, hubert_params=hub_params,
                 hubert_cfg=hub_cfg, speedup=SPEEDUP)
def sync(o): np.asarray(o[0][-4:])
t0 = time.time(); sync(fused(wav)); log(f"| warmup {time.time()-t0:.1f}s")
ts = []
for i in range(8):
    t0 = time.time()
    sync(fused(wav, rng=jax.random.PRNGKey(100+i)))
    ts.append(time.time()-t0)
log(f"| 24k fused RTF bf16+packed-fp32-voc: {min(ts)/SECS:.4f} (runs: "
    + " ".join(f"{x:.3f}" for x in ts) + ")")
