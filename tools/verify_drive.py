"""End-to-end CLI drive (.claude/skills/verify recipe, automated):
binarize.py -> run.py (train, sanity-val, checkpoints) -> infer.py on CPU
with synthesized reference-format checkpoints and unit sidecars.

    python tools/verify_drive.py      # prints ALL VERIFY STEPS PASSED

Scratch dir: a fresh tempfile.mkdtemp() (safe for concurrent runs).
"""
import os
import runpy
import shutil
import sys
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_e2e_infer import _make_diffusion_ckpt, _make_hifigan_ckpt, MEL_BINS, HID, RES_CH, LAYERS
from diffsvc_tpu.utils.audio_io import save_wav

SCRATCH = tempfile.mkdtemp(prefix="verify_scratch_")
os.makedirs(f"{SCRATCH}/raw", exist_ok=True)
os.makedirs(f"{SCRATCH}/checkpoints/testproj", exist_ok=True)
os.chdir(SCRATCH)

# --- data: sine songs with embedded silences (exercises the slicer) ---
sr = 8000
rng = np.random.RandomState(0)
for i, freq in enumerate([196.0, 220.0, 247.0, 262.0, 294.0, 330.0, 349.0, 392.0]):
    segs = []
    for rep in range(2):
        t = np.arange(int(sr * 1.2)) / sr
        segs.append(0.4 * np.sin(2 * np.pi * freq * t))
        segs.append(np.zeros(int(sr * 0.7)))
    wav = np.concatenate(segs).astype(np.float32)
    save_wav(wav, f"raw/song{i}.wav", sr)
    # unit sidecars: hubert frame rate = 16k resample / 320
    n_units = max(2 * len(wav) // 320, 1)
    np.save(f"raw/song{i}.npy", (rng.randn(n_units, HID) * 0.1).astype(np.float32))

hp = dict(
    audio_sample_rate=sr, audio_num_mel_bins=MEL_BINS, fft_size=256,
    hop_size=64, win_size=256, fmin=30, fmax=4000, wav2spec_eps=1e-6,
    hidden_size=HID, residual_layers=LAYERS, residual_channels=RES_CH,
    dilation_cycle_length=4, timesteps=50, K_step=50,
    diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
    keep_bins=MEL_BINS, spec_min=[-6.0], spec_max=[1.5],
    no_fs2=True, use_pitch_embed=True, use_energy_embed=False,
    use_spk_id=False, use_spk_embed=False, use_uv=False,
    pitch_norm="log", f0_bin=256, f0_min=50.0, f0_max=1100.0,
    use_nsf=False, use_crepe=False, use_vec=False,
    vocoder="HifiGAN", vocoder_ckpt=f"{SCRATCH}/vocoder",
    hubert_path=f"{SCRATCH}/nonexistent_hubert",
    pe_ckpt="", pe_enable=False,
    max_frames=42000, max_input_tokens=60000, mel_vmin=-6.0, mel_vmax=1.5,
    num_spk=1,
    binarization_args=dict(with_f0=True, with_hubert=True, with_align=True),
    work_dir="", pndm_speedup=10, debug=False,
    raw_data_dir=f"{SCRATCH}/raw", binary_data_dir=f"{SCRATCH}/binary",
    speaker_id="verify", binarizer_cls="preprocessing.SVCpre.SVCBinarizer",
    task_cls="training.task.SVC_task.SVCTask",
    max_sentences=2, max_tokens=6000, max_updates=4, val_check_interval=2,
    num_sanity_val_steps=1, num_valid_plots=0, num_ckpt_keep=2,
    lr=4e-4, scheduler="step_lr", decay_steps=100,
    optimizer_adam_beta1=0.9, optimizer_adam_beta2=0.98, weight_decay=0,
    clip_grad_norm=1, accumulate_grad_batches=1, seed=1234, save_ckpt=True,
    endless_ds=False, ds_workers=0, test_num=2, valid_num=0,
    train_set_name="train", valid_set_name="valid", test_set_name="test",
    # new this session: exercise the precision hparam end-to-end
    train_matmul_precision="highest",
)
with open("config.yaml", "w") as f:
    yaml.safe_dump(hp, f)

_make_diffusion_ckpt("checkpoints/testproj/model_ckpt_steps_1000.ckpt")
_make_hifigan_ckpt(f"{SCRATCH}/vocoder")

# --- 1. binarize ---
print("=== binarize ===", flush=True)
sys.argv = ["binarize.py", "--config", "config.yaml"]
runpy.run_path(f"{REPO}/binarize.py", run_name="__main__")
assert os.path.exists("binary/train.data"), os.listdir("binary")
print("binarize OK:", sorted(os.listdir("binary")), flush=True)

# --- 2. train a few steps ---
print("=== train ===", flush=True)
sys.argv = ["run.py", "--config", "config.yaml", "--exp_name", "verifyexp", "--reset"]
runpy.run_path(f"{REPO}/run.py", run_name="__main__")
work = "checkpoints/verifyexp"
ckpts = [f for f in os.listdir(work) if f.startswith("model_ckpt_steps_")]
assert ckpts, os.listdir(work)
print("train OK:", sorted(ckpts), flush=True)

# --- 3. infer CLI ---
print("=== infer ===", flush=True)
# chunks are in-memory wavs without .npy sidecars -> fake the encoder
from diffsvc_tpu.infer import hubert_encoder as _he
from diffsvc_tpu.utils.audio_io import load_wav as _lw


def _fake_encode(self, wav_path):
    wav16, _ = _lw(wav_path, sr=16000)
    n = max(len(wav16) // 320, 1)
    return (np.random.RandomState(1).randn(n, HID) * 0.1).astype(np.float32)


_he.Hubertencoder.encode = _fake_encode
sys.argv = ["infer.py", "--project", "testproj", "--model",
            "checkpoints/testproj/model_ckpt_steps_1000.ckpt",
            "--config", "config.yaml", "--files", "raw/song0.wav",
            "--key", "2", "--acc", "10", "--no_pe", "--no_crepe"]
runpy.run_path(f"{REPO}/infer.py", run_name="__main__")
outs = [f for f in os.listdir("results") if f.endswith(".wav")]
assert outs, os.listdir("results")
from scipy.io import wavfile
rate, data = wavfile.read(os.path.join("results", outs[0]))
wav_in, _ = wavfile.read("raw/song0.wav")[1], None
assert rate == sr, rate
assert np.isfinite(data.astype(np.float64)).all()
ratio = len(data) / len(wav_in)
print(f"infer OK: {outs[0]} sr={rate} len_ratio={ratio:.4f}", flush=True)
assert abs(ratio - 1.0) < 1e-6, ratio  # parity mode: exact length

# --- 4. warm start: the persistent compile cache must survive processes ---
# (VERDICT r4 #8: flask --warmup's 20-70 s/bucket cold compiles happen once
# per machine, not once per server start). Two fresh subprocesses compile
# the same jit program against one cache dir; the second must be a cache
# HIT — asserted on content (the dir gains entries in run 1 and none in
# run 2) rather than wall time, which is noisy on a loaded host.
print("=== warm start (persistent compile cache) ===", flush=True)
import subprocess
import tempfile as _tf

cache_dir = os.path.join(_tf.mkdtemp(prefix="verify_cc_"), "xla")
child = (
    "import jax, time\n"
    "jax.config.update('jax_platforms','cpu')\n"
    "from diffsvc_tpu.utils.compile_cache import enable\n"
    "enable()\n"
    # enable() pins min_compile_time to 1.0 s (right for the 20-70 s
    # production programs); this probe program is tiny, so lower it
    "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)\n"
    "import jax.numpy as jnp\n"
    "f = jax.jit(lambda x: jnp.tanh(x @ x) @ x)\n"
    "t0 = time.time()\n"
    "f(jnp.ones((512, 512))).block_until_ready()\n"
    "print('compile_s', time.time() - t0)\n")
env = dict(os.environ, DIFFSVC_COMPILE_CACHE=cache_dir,
           PYTHONPATH=REPO,
           JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0")
times = []
for tag in ("cold", "warm"):
    r = subprocess.run([sys.executable, "-c", child], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    n_entries = sum(len(fs) for _, _, fs in os.walk(cache_dir))
    t = float(r.stdout.split("compile_s")[1].split()[0])
    times.append(t)
    print(f"warm-start {tag}: first-call {t:.2f}s, "
          f"cache entries {n_entries}", flush=True)
    if tag == "cold":
        assert n_entries > 0, "compile cache dir never populated"
        cold_entries = n_entries
assert n_entries == cold_entries, (
    "second process MISSED the persistent compile cache "
    f"(entries grew {cold_entries} -> {n_entries})")
print("ALL VERIFY STEPS PASSED", flush=True)
