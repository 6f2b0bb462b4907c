"""Training-loop tests on the virtual 8-device CPU mesh: binarize synthetic
data, train steps with data-parallel sharding, checkpoint/resume exactness."""

import os
import pickle

import jax
import numpy as np
import pytest
import yaml

from diffsvc_tpu.config import HParams
from diffsvc_tpu.data.binarizer import SVCBinarizer
from diffsvc_tpu.data.dataset import BatchIterator, FastSpeechDataset, build_batches
from diffsvc_tpu.training import checkpoint as ckpt_lib
from diffsvc_tpu.training.scheduler import rsqrt_schedule, step_lr_schedule
from diffsvc_tpu.training.task import SVCTask
from diffsvc_tpu.utils.audio_io import save_wav

MEL = 16
HID = 256


def _hp(tmp, **kw):
    hp = HParams(
        audio_sample_rate=8000, audio_num_mel_bins=MEL, fft_size=256,
        hop_size=64, win_size=256, fmin=30, fmax=4000, wav2spec_eps=1e-6,
        hidden_size=HID, residual_layers=4, residual_channels=32,
        dilation_cycle_length=4, timesteps=20, K_step=20,
        diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=MEL, spec_min=[-6.0], spec_max=[1.5],
        no_fs2=True, use_pitch_embed=True, use_energy_embed=False,
        use_spk_id=False, use_spk_embed=False, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=50.0, f0_max=1100.0,
        use_crepe=False, use_vec=False, vocoder="HifiGAN",
        raw_data_dir=str(tmp / "raw"), binary_data_dir=str(tmp / "bin"),
        work_dir=str(tmp / "work"), speaker_id="tester", num_spk=1,
        choose_test_manually=False, test_prefixes=[],
        hubert_path=str(tmp / "nohubert"),
        binarization_args=dict(with_f0=True, with_hubert=True,
                               with_align=True, with_wav=False, shuffle=False),
        lr=1e-3, scheduler="step_lr", decay_steps=100,
        optimizer_adam_beta1=0.9, optimizer_adam_beta2=0.98, weight_decay=0,
        clip_grad_norm=1, accumulate_grad_batches=1,
        max_updates=10, max_epochs=100, max_tokens=4000, max_sentences=8,
        max_eval_tokens=4000, max_eval_sentences=1, max_frames=42000,
        max_input_tokens=60000, frames_multiple=32, endless_ds=False,
        sort_by_len=True, seed=1234, num_sanity_val_steps=1,
        val_check_interval=5, num_valid_plots=0, log_interval=2,
        num_ckpt_keep=2, save_best=False, load_ckpt="", debug=False,
        config_path=str(tmp / "cfg.yaml"), ds_workers=0, pndm_speedup=5,
        mel_vmin=-6.0, mel_vmax=1.5, infer=False,
    )
    hp.update(kw)
    return hp


@pytest.fixture(scope="module")
def binarized(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("train_e2e")
    hp = _hp(tmp)
    with open(hp["config_path"], "w") as f:
        yaml.safe_dump({k: v for k, v in hp.items()
                        if isinstance(v, (int, float, str, bool, list, dict))}, f)
    os.makedirs(hp["raw_data_dir"], exist_ok=True)
    rng = np.random.RandomState(0)
    sr = 8000
    for i in range(8):
        secs = 0.4 + 0.15 * i
        t = np.arange(int(sr * secs)) / sr
        freq = 150 + 30 * i
        wav = 0.4 * np.sin(2 * np.pi * freq * t).astype(np.float32)
        save_wav(wav, os.path.join(hp["raw_data_dir"], f"item{i}.wav"), sr)

    binarizer = SVCBinarizer(hp)
    # no hubert weights in tests: random soft units at the unit frame rate
    class FakeEnc:
        def encode(self, wav_fn):
            from diffsvc_tpu.utils.audio_io import load_wav

            wav, _ = load_wav(wav_fn, sr=16000)
            n = max(len(wav) // 320, 1)
            return rng.randn(n, HID).astype(np.float32) * 0.1

    binarizer._phone_encoder = lambda: FakeEnc()
    binarizer.process()
    return tmp, hp


def test_binarizer_outputs(binarized):
    tmp, hp = binarized
    d = hp["binary_data_dir"]
    for prefix in ("train", "valid", "test"):
        assert os.path.exists(f"{d}/{prefix}.data")
        assert os.path.exists(f"{d}/{prefix}.idx")
        assert os.path.exists(f"{d}/{prefix}_lengths.npy")
    assert os.path.exists(f"{d}/spk_map.json")
    # spec stats written back into the config file
    cfg = yaml.safe_load(open(hp["config_path"]))
    assert len(cfg["spec_min"]) == MEL
    assert len(cfg["spec_max"]) == MEL
    # last-5 items are test==valid; train has the remaining 3
    assert len(np.load(f"{d}/train_lengths.npy")) == 3
    assert len(np.load(f"{d}/test_lengths.npy")) == 5


def test_dataset_and_batches(binarized):
    tmp, hp = binarized
    ds = FastSpeechDataset("train", hp, shuffle=True)
    assert len(ds) == 3
    sample = ds[0]
    assert sample["mel"].shape[1] == MEL
    assert sample["hubert"].shape[1] == HID
    assert sample["mel2ph"].max() == sample["hubert"].shape[0]
    batches = build_batches(ds, hp, num_replicas=1)
    assert sum(len(b) for b in batches) == 3
    it = BatchIterator(ds, batches, pad_multiple=32)
    for batch in it:
        assert batch["mels"].shape[1] % 32 == 0
        assert batch["mels"].shape[1] >= batch["mel_lengths"].max()


def test_train_step_on_mesh(binarized):
    """Data-parallel train step on the virtual 8-device mesh: loss decreases
    and params update."""
    tmp, hp = binarized
    from diffsvc_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(("data",))
    assert mesh.shape["data"] == 8
    task = SVCTask(hp, mesh=mesh)
    state = task.init_state()

    ds = FastSpeechDataset("train", hp, shuffle=False)
    samples = [ds[i % len(ds)] for i in range(8)]
    batch = ds.collater(samples, pad_multiple=32)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(5):
        state, metrics = task.train_step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert int(state["step"]) == 5
    assert np.isfinite(losses).all()
    # zero-init output head -> initial loss ~ E[noise^2] ~ 1
    assert 0.5 < losses[0] < 2.0


def test_meshless_task_clears_declared_train_mesh(binarized):
    """A mesh-less task must CLEAR the pallas-train mesh a previous task
    in the same process declared — otherwise its traces would shard_map
    the fused kernel over devices it never asked for (the declaration is
    read at trace time, models/diffnet._shardable_data_mesh)."""
    tmp, hp = binarized
    from diffsvc_tpu.models import diffnet
    from diffsvc_tpu.parallel import mesh as mesh_lib

    prev = diffnet.set_train_mesh(None)
    try:
        mesh = mesh_lib.make_mesh(("data",))
        SVCTask(hp, mesh=mesh)._make_train_step()
        assert diffnet._TRAIN_MESH is mesh
        SVCTask(hp)._make_train_step()
        assert diffnet._TRAIN_MESH is None
    finally:
        diffnet.set_train_mesh(prev)


def test_train_matmul_precision_hparam(binarized):
    """train_matmul_precision plumbs through to the jitted step (loss matches
    the default on CPU, where every precision lowers to fp32)."""
    tmp, hp = binarized
    hp_hi = HParams(dict(hp))
    hp_hi["train_matmul_precision"] = "highest"
    ds = FastSpeechDataset("train", hp, shuffle=False)
    batch = ds.collater([ds[0]], pad_multiple=32)
    rng = jax.random.PRNGKey(0)
    losses = []
    for hp_i in (hp, hp_hi):
        task = SVCTask(hp_i)
        state = task.init_state()
        _, metrics = task.train_step(state, dict(batch), rng)
        losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


def test_optimizer_radam_option(binarized):
    """optimizer: radam wires optax.radam (reference vendors RAdam for PWG,
    modules/parallel_wavegan/optimizers/radam.py); steps stay finite and
    params move."""
    tmp, hp = binarized
    hp_r = HParams(dict(hp))
    hp_r["optimizer"] = "radam"
    ds = FastSpeechDataset("train", hp, shuffle=False)
    batch = ds.collater([ds[0]], pad_multiple=32)
    rng = jax.random.PRNGKey(0)
    task = SVCTask(hp_r)
    state = task.init_state()
    p0 = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(state["params"])]
    for _ in range(2):
        state, metrics = task.train_step(state, dict(batch), rng)
    assert np.isfinite(float(metrics["loss"]))
    p1 = jax.tree_util.tree_leaves(state["params"])
    assert any(not np.allclose(a, b) for a, b in zip(p0, p1))
    with pytest.raises(ValueError):
        hp_bad = HParams(dict(hp))
        hp_bad["optimizer"] = "sgdx"
        SVCTask(hp_bad)


def test_trainer_fit_and_resume(binarized):
    tmp, hp = binarized
    hp = HParams(dict(hp))
    hp["work_dir"] = str(tmp / "work_fit")
    hp["max_updates"] = 6
    hp["val_check_interval"] = 3
    from diffsvc_tpu.training.trainer import Trainer

    t1 = Trainer(hp, use_mesh=True, log_writer=False)
    t1.writer = None
    state = t1.fit()
    assert t1.global_step == 6
    ckpt = ckpt_lib.latest_checkpoint(hp["work_dir"])
    assert ckpt and "steps_6" in ckpt

    # resume continues from step 6 and trains to 8
    hp2 = HParams(dict(hp))
    hp2["max_updates"] = 8
    t2 = Trainer(hp2, use_mesh=True, log_writer=False)
    t2.writer = None
    state2 = t2.fit()
    assert t2.global_step == 8
    # resumed params match saved params at save time plus 2 steps of training
    with open(ckpt_lib.latest_checkpoint(hp["work_dir"]), "rb") as f:
        saved = pickle.load(f)
    assert saved["global_step"] == 8


def test_prefetch_to_device_parity(binarized):
    """prefetch_to_device starts the batch upload in the prefetch thread
    (sharded per the step's in_shardings); it must be a pure placement
    optimization — final params bit-identical to the host-numpy path."""
    import jax

    from diffsvc_tpu.training.trainer import Trainer

    tmp, hp = binarized
    results = []
    for flag in (False, True):
        hp2 = HParams(dict(hp))
        hp2["work_dir"] = str(tmp / f"work_put_{flag}")
        hp2["max_updates"] = 4
        hp2["val_check_interval"] = 100
        hp2["prefetch_to_device"] = flag
        t = Trainer(hp2, use_mesh=True, log_writer=False)
        t.writer = None
        state = t.fit()
        results.append(jax.tree.map(np.asarray, state["params"]))
    a, b = results
    leaves_a, treedef_a = jax.tree.flatten(a)
    leaves_b, treedef_b = jax.tree.flatten(b)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(la, lb)


def test_resident_dataset_parity(binarized):
    """resident_dataset keeps the binarized features in device memory and
    feeds the step from per-sample indices (on-device gather + zero-mask).
    It must reproduce the host collate exactly: final params bit-identical
    to the host-numpy pipeline over a multi-step fit on the 8-device mesh."""
    import jax

    from diffsvc_tpu.training.trainer import Trainer

    tmp, hp = binarized
    results = []
    for flag in (False, True):
        hp2 = HParams(dict(hp))
        hp2["work_dir"] = str(tmp / f"work_resident_{flag}")
        hp2["max_updates"] = 4
        hp2["val_check_interval"] = 100
        hp2["resident_dataset"] = flag
        t = Trainer(hp2, use_mesh=True, log_writer=False)
        t.writer = None
        state = t.fit()
        results.append(jax.tree.map(np.asarray, state["params"]))
    a, b = results
    leaves_a, treedef_a = jax.tree.flatten(a)
    leaves_b, treedef_b = jax.tree.flatten(b)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(la, lb)


def test_resident_chunked_dispatch_parity(binarized):
    """train_steps_per_dispatch > 1 scans several steps inside one dispatch
    (one packed meta upload per chunk). With uniform length buckets (all
    fixture clips pad to one 128-frame bucket) the data/RNG streams are
    identical to per-step resident dispatch — params must agree to a few
    float ulps (XLA compiles the scanned body as a DIFFERENT program, so
    reductions may associate differently; observed up to 1 ulp depending on
    host/oneDNN) — and chunk ends must align with the val/max_updates
    boundaries (max_updates=7, val_check_interval=3, spd=4 forces chunk
    sizes 3, 3, 1). Tolerance policy: conftest.assert_allclose_ulp."""
    import jax

    from diffsvc_tpu.training.trainer import Trainer

    tmp, hp = binarized
    results = []
    for spd in (1, 4):
        hp2 = HParams(dict(hp))
        hp2["work_dir"] = str(tmp / f"work_spd_{spd}")
        hp2["max_updates"] = 7
        hp2["val_check_interval"] = 3
        hp2["resident_dataset"] = True
        hp2["train_steps_per_dispatch"] = spd
        t = Trainer(hp2, use_mesh=True, log_writer=False)
        t.writer = None
        state = t.fit()
        assert int(state["step"]) == 7
        results.append(jax.tree.map(np.asarray, state["params"]))
    a, b = results
    from tests.conftest import assert_allclose_ulp

    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert_allclose_ulp(la, lb, ulps=8, err_msg="chunked dispatch parity")


def test_checkpoint_keep_k_and_best(tmp_path):
    state = {"params": {"w": np.ones(3)}, "opt_state": (), "step": 1}
    for step, val in [(1, 1.0), (2, 0.5), (3, 0.7), (4, 0.4)]:
        ckpt_lib.save_checkpoint(str(tmp_path), state, 0, step,
                                 num_ckpt_keep=2, save_best=True,
                                 monitor_value=val)
    import glob

    kept = sorted(glob.glob(str(tmp_path / "model_ckpt_steps_*.ckpt")))
    assert len(kept) == 2
    assert "steps_3" in kept[0] and "steps_4" in kept[1]
    assert os.path.exists(tmp_path / "model_ckpt_best.pt")
    assert float(np.load(tmp_path / "best_valid.npy")[0]) == 0.4


def test_schedulers():
    s = step_lr_schedule(1e-3, decay_steps=10, gamma=0.5)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(10)) == pytest.approx(5e-4)
    assert float(s(25)) == pytest.approx(2.5e-4)
    r = rsqrt_schedule(1e-3, warmup_updates=100, hidden_size=256)
    assert float(r(50)) < float(r(100))  # warming up
    assert float(r(400)) < float(r(100))  # decaying
    assert float(r(100)) == pytest.approx(1e-3 * 100**-0.5 * 0 + 1e-3 * (100**-0.5) * (256**-0.5), rel=1e-5)


def test_step_lr_counts_optimizer_steps_under_accumulation():
    """optax.MultiSteps advances the inner adamw count once per
    accumulate_grad_batches micro-steps, so the schedule must NOT divide by
    accumulate again (reference StepLR steps on global_step // accumulate,
    SVC_task.py:125)."""
    import jax.numpy as jnp
    import optax

    # lr(step) = step: with constant unit grads adamw moves ~-lr per real
    # update, so the trajectory reveals the counts the schedule saw
    tx = optax.MultiSteps(
        optax.adamw(lambda step: step.astype(jnp.float32), weight_decay=0.0),
        every_k_schedule=2)
    params = {"w": np.zeros(3, np.float32)}
    opt_state = tx.init(params)
    g = {"w": np.ones(3, np.float32)}
    traj = []
    for _ in range(6):  # 6 micro-steps = 3 real updates
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        traj.append(float(np.asarray(params["w"][0])))
    # counts 0,1,2 -> lr 0,1,2 -> w ~ 0 after update 1, ~-1, ~-3
    assert abs(traj[1]) < 1e-6, traj           # first real update: lr == 0
    assert -1.2 < traj[3] < -0.8, traj         # second: lr == 1
    assert -3.5 < traj[5] < -2.5, traj         # third: lr == 2 (NOT 0/0/1)


def test_vocoder_weights_available():
    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.training.trainer import vocoder_weights_available
    import os, tempfile

    assert not vocoder_weights_available(HParams())
    assert not vocoder_weights_available(HParams(vocoder="HifiGAN"))
    assert not vocoder_weights_available(
        HParams(vocoder="HifiGAN", vocoder_ckpt="/nonexistent/dir/model"))
    with tempfile.TemporaryDirectory() as d:
        # an existing-but-EMPTY directory must not count as weights — a
        # wrapper built on it would have no params and fail later with an
        # AttributeError instead of being cleanly disabled (ADVICE r2)
        assert not vocoder_weights_available(
            HParams(vocoder="HifiGAN", vocoder_ckpt=d))
        assert not vocoder_weights_available(
            HParams(vocoder="NsfHifiGAN", vocoder_ckpt=os.path.join(d, "model")))
        f = os.path.join(d, "model_ckpt_steps_10.ckpt")
        open(f, "w").close()
        # file form, directory form, and the reference NSF ".../model"
        # prefix form all resolve once a checkpoint file exists
        assert vocoder_weights_available(
            HParams(vocoder="HifiGAN", vocoder_ckpt=f))
        assert vocoder_weights_available(
            HParams(vocoder="HifiGAN", vocoder_ckpt=d))
        assert vocoder_weights_available(
            HParams(vocoder="NsfHifiGAN", vocoder_ckpt=os.path.join(d, "model")))


def test_print_nan_grads_flag_compiles_and_fires(capfd):
    """print_nan_grads (reference utils/pl_utils.py:1086-1090): a batch
    engineered to produce NaN loss must name the offending grads on stderr
    without crashing the step."""
    import jax

    from diffsvc_tpu.config import HParams
    from diffsvc_tpu.training.task import SVCTask

    hp = HParams(
        audio_num_mel_bins=8, hidden_size=16, residual_layers=2,
        residual_channels=8, dilation_cycle_length=2, timesteps=10,
        K_step=10, diff_loss_type="l2", schedule_type="linear", max_beta=0.02,
        keep_bins=8, spec_min=[-6.0], spec_max=[1.5], no_fs2=True,
        use_pitch_embed=True, use_energy_embed=False, use_uv=False,
        pitch_norm="log", f0_bin=256, f0_min=50.0, f0_max=1100.0,
        lr=1e-3, scheduler="step_lr", decay_steps=100,
        optimizer_adam_beta1=0.9, optimizer_adam_beta2=0.98, weight_decay=0,
        clip_grad_norm=1, accumulate_grad_batches=1, seed=0,
        print_nan_grads=True,
    )
    task = SVCTask(hp)
    state = task.init_state()
    b, t_mel, t_ph = 2, 16, 8
    rng = np.random.RandomState(0)
    mel2ph = np.clip((np.arange(t_mel)[None, :] * t_ph // t_mel) + 1, 1,
                     t_ph).astype(np.int32) * np.ones((b, 1), np.int32)
    batch = {
        "hubert": rng.randn(b, t_ph, 16).astype(np.float32),
        "mel2ph": mel2ph,
        "f0": np.full((b, t_mel), np.log2(220.0), np.float32),
        "uv": np.zeros((b, t_mel), np.float32),
        "energy": np.zeros((b, t_mel), np.float32),
        "mels": np.full((b, t_mel, 8), np.nan, np.float32),  # poison
    }
    state, metrics = task.train_step(state, batch, jax.random.PRNGKey(0))
    jax.effects_barrier()
    assert not np.isfinite(float(metrics["loss"]))
    out = capfd.readouterr()
    assert "non-finite grad" in out.out + out.err

    # clean batch on the same compiled step (fresh params — the NaN step
    # above poisoned the optimizer update): no warning
    batch["mels"] = rng.randn(b, t_mel, 8).astype(np.float32)
    state = task.init_state()
    state, metrics = task.train_step(state, batch, jax.random.PRNGKey(1))
    jax.effects_barrier()
    assert np.isfinite(float(metrics["loss"]))
    out = capfd.readouterr()
    assert "non-finite grad" not in out.out + out.err
