"""Training loop: step-based validation/checkpoint cadence, auto-resume,
TensorBoard logging, hard stop at max_updates.

Parity targets (reference ``utils/pl_utils.py`` semantics, SURVEY.md §2.2):
- validation every ``val_check_interval`` *global steps*; sanity-val
  ``num_sanity_val_steps`` batches before training,
- checkpoint at each validation; keep-K rotation, best tracking,
- auto-resume from the highest ``model_ckpt_steps_*.ckpt`` in the work dir,
- hard exit when ``global_step > max_updates``,
- TensorBoard scalars prefixed ``tr/`` and ``val/``; ``log_interval`` cadence,
- the resolved config is re-dumped to ``work_dir/config.yaml`` at train start.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from ..config.hparams import HParams, save_hparams
from ..data.dataset import BatchIterator, FastSpeechDataset, build_batches
from ..parallel import mesh as mesh_lib
from . import checkpoint as ckpt_lib
from .task import SVCTask


def vocoder_weights_available(hp) -> bool:
    """True when the config names a vocoder AND its checkpoint location
    exists on disk. ``vocoder_ckpt`` may point at a file
    (``.../model_ckpt_steps_N.ckpt``), or at a ``.../model`` prefix as the
    reference NSF configs do — for the prefix form, require an actual
    checkpoint file in the parent directory (an existing-but-empty work
    dir must not construct a wrapper with no weights)."""
    if not hp.get("vocoder"):
        return False
    ckpt = str(hp.get("vocoder_ckpt", ""))
    if not ckpt:
        return False
    if os.path.isfile(ckpt):
        return True
    import glob as _glob

    # directory form: look inside it; prefix form: look in the parent
    search_dir = ckpt if os.path.isdir(ckpt) else os.path.dirname(ckpt)
    if not os.path.isdir(search_dir):
        return False
    # every filename shape the wrapper loaders actually accept:
    # hifigan.py globs model_ckpt_steps_*.* (any extension), the NSF
    # wrapper loads a bare 'model', pwg loads checkpoint-*steps.pkl
    pats = ("model_ckpt_steps_*.*", "model", "g_*", "generator*",
            "checkpoint-*steps.pkl")
    return any(_glob.glob(os.path.join(search_dir, p)) for p in pats)


def resolve_task_cls(name: str):
    """Map reference task_cls strings onto framework tasks."""
    if "pe" in name.lower() and "PitchExtraction" in name:
        from .pe_task import PitchExtractionTask

        return PitchExtractionTask
    return SVCTask


class Trainer:
    def __init__(self, hp: HParams, use_mesh: bool = True,
                 log_writer=None, task_cls=None):
        from ..utils.compile_cache import enable as _enable_compile_cache

        _enable_compile_cache()
        self.hp = hp
        self.work_dir = hp["work_dir"]
        os.makedirs(self.work_dir, exist_ok=True)
        save_hparams(hp, self.work_dir)

        n_dev = len(jax.devices())
        axes = tuple(str(hp.get("mesh_axes", "data")).split(","))
        shape = hp.get("mesh_shape")
        self.mesh = mesh_lib.make_mesh(axes, shape=shape) \
            if (use_mesh and n_dev > 1) else None
        self.world = mesh_lib.data_parallel_world_size(self.mesh)
        task_cls = task_cls or resolve_task_cls(hp.get("task_cls", ""))
        self.task = task_cls(hp, mesh=self.mesh)

        self.global_step = 0
        self.epoch = 0
        self.best = None
        # multi-host: checkpoints/TensorBoard are process-0-only (reference
        # DDP rank-0-only saving, utils/pl_utils.py:1284)
        self.is_proc0 = jax.process_index() == 0
        self.writer = log_writer or (self._build_writer()
                                     if self.is_proc0 else None)
        self.rng = jax.random.PRNGKey(hp.get("seed", 1234))

        # the reference SVCTask builds its vocoder in the ctor for validation
        # audio; optional here (training runs fine without the weights)
        self.vocoder = None
        try:
            if vocoder_weights_available(hp):
                from ..vocoders.base import get_vocoder_cls

                self.vocoder = get_vocoder_cls(hp)(hp)
        except Exception as e:
            print(f"| validation vocoder unavailable: {e}")

    def _build_writer(self):
        try:
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(
                log_dir=os.path.join(self.work_dir, "lightning_logs", "lastest"))
        except Exception:
            return None

    def _log(self, prefix: str, metrics: Dict, step: int):
        if self.writer is None:
            return
        for k, v in metrics.items():
            try:
                self.writer.add_scalar(f"{prefix}/{k}", float(v), step)
            except Exception:
                pass

    # ------------------------------------------------------------------
    def fit(self, max_steps: Optional[int] = None):
        hp = self.hp
        state = self.task.init_state()

        restored = ckpt_lib.restore_checkpoint(self.work_dir)
        if restored is not None:
            st, self.epoch, self.global_step, self.best = restored
            state = jax.tree.map(lambda x: x, st)
            state["step"] = np.asarray(self.global_step, np.int32)
        elif hp.get("load_ckpt"):
            params = ckpt_lib.load_params_for_infer(hp["load_ckpt"])
            state = self.task.load_params_into_state(state, params)
            print(f"| warm-started from {hp['load_ckpt']}")

        state, self.epoch, self.global_step, self.best = \
            mesh_lib.sync_resume_state(
                state, self.epoch, self.global_step, self.best, self.mesh)

        train_ds = FastSpeechDataset("train", hp, shuffle=True)
        valid_ds = FastSpeechDataset("valid", hp, shuffle=False)
        max_updates = int(max_steps or hp.get("max_updates", 1_000_000))
        val_check_interval = int(hp.get("val_check_interval", 2000))
        log_interval = int(hp.get("log_interval", 100))
        pad_multiple = int(hp.get("frames_multiple", 128))

        # sanity validation (pl_utils.py:557-571)
        for i, batch in enumerate(self._val_batches(valid_ds, pad_multiple)):
            if i >= int(hp.get("num_sanity_val_steps", 1)):
                break
            self.task.val_step(state["params"], batch, self.rng)
        print("| sanity validation ok")

        # Device-resident dataset: features live in HBM, the step wire is
        # per-sample indices only (task.build_resident docstring). Exact:
        # bit-identical params vs the host pipeline
        # (tests/test_training.py::test_resident_dataset_parity).
        resident = bool(hp.get("resident_dataset")) \
            and jax.process_count() == 1 \
            and hasattr(self.task, "build_resident")
        if resident:
            nbytes = self.task.build_resident(train_ds, pad_multiple)
            print(f"| resident dataset: {nbytes / 1e6:.1f} MB "
                  f"({len(train_ds)} items) uploaded once")

        t_start = time.time()
        seen = 0
        while self.epoch < int(hp.get("max_epochs", 1000)):
            rng_np = np.random.RandomState(hp.get("seed", 1234) + self.epoch)
            batches = build_batches(train_ds, hp, num_replicas=self.world, rng=rng_np)
            it = BatchIterator(train_ds, batches, pad_multiple=pad_multiple)

            # pad the batch axis up to the data-parallel multiple (no-op
            # size-wise when divisible); sample_mask keeps the loss exact
            # and the jit batch-structure stable. Collation+padding run a
            # couple of batches ahead in a background thread so the host
            # pipeline overlaps device compute; prefetch_to_device
            # additionally starts the host->device upload from the prefetch
            # thread. Measured placement-parity-exact but THROUGHPUT-NEUTRAL
            # (tools/bench_train_loop.py: 0.93x steady on the tunneled TPU,
            # 0.99x CPU) — jax's async dispatch already pipelines the
            # upload, and the tunnel serializes transfers either way — so
            # it stays opt-in. The real lever for upload-bound loops is
            # resident_dataset (dataset in HBM, indices on the wire).
            from ..data.dataset import _pad_batch_dim, prefetch

            put_fn = getattr(self.task, "put_batch", None)
            put = bool(hp.get("prefetch_to_device", False)) \
                and jax.process_count() == 1 and put_fn is not None

            def _prep(batch):
                n = -(-batch["nsamples"] // self.world) * self.world
                batch = _pad_batch_dim(batch, n)
                return put_fn(batch) if put else batch

            # `run_steps` yields once per training step and keeps the
            # current state in `holder` (chunked mode advances it several
            # steps per dispatch; chunk ends are aligned to the val/
            # max_updates boundaries so the bookkeeping below always sees
            # the state AT its trigger step).
            spd = int(hp.get("train_steps_per_dispatch", 1) or 1)
            holder = [state]

            def run_steps():
                if resident and spd > 1:
                    pos = 0
                    while pos < len(batches):
                        to_val = val_check_interval - (
                            self.global_step % val_check_interval)
                        k = max(1, min(spd, max_updates - self.global_step,
                                       to_val, len(batches) - pos))
                        holder[0], ms = self.task.train_chunk_resident(
                            holder[0], batches[pos:pos + k], self.rng)
                        pos += k
                        for j in range(k):
                            yield {kk: vv[j] for kk, vv in ms.items()}
                elif resident:
                    for idxs in batches:
                        holder[0], m = self.task.train_step_resident(
                            holder[0], idxs, self.rng)
                        yield m
                else:
                    for b in prefetch(iter(it), _prep, depth=2):
                        holder[0], m = self.task.train_step(
                            holder[0], b, self.rng)
                        yield m

            for metrics in run_steps():
                state = holder[0]
                self.global_step += 1
                seen += 1
                if self.global_step % log_interval == 0 and self.is_proc0:
                    m = {k: float(v) for k, v in metrics.items()}
                    self._log("tr", m, self.global_step)
                    rate = seen / max(time.time() - t_start, 1e-9)
                    print(f"| step {self.global_step} loss {m['loss']:.4f} "
                          f"lr {m['lr']:.2e} ({rate:.2f} it/s)")
                if self.global_step % val_check_interval == 0:
                    val_loss = self.validate(state, valid_ds, pad_multiple)
                    if self.is_proc0:
                        ckpt_lib.save_checkpoint(
                            self.work_dir, state, self.epoch, self.global_step,
                            best=self.best,
                            num_ckpt_keep=int(self.hp.get("num_ckpt_keep", 10)),
                            save_best=bool(self.hp.get("save_best", False)),
                            monitor_value=val_loss)
                if self.global_step >= max_updates:
                    print("| TRAINING FINISHED: reached max_updates")
                    self.validate(state, valid_ds, pad_multiple)
                    if self.is_proc0:
                        ckpt_lib.save_checkpoint(
                            self.work_dir, state, self.epoch, self.global_step,
                            best=self.best,
                            num_ckpt_keep=int(self.hp.get("num_ckpt_keep", 10)))
                    return state
            self.epoch += 1
        return state

    # ------------------------------------------------------------------
    def _val_batches(self, valid_ds, pad_multiple):
        hp = self.hp
        idxs = list(range(len(valid_ds)))
        from ..data.batching import batch_by_size

        batches = batch_by_size(
            idxs, valid_ds.num_tokens,
            max_tokens=hp.get("max_eval_tokens", 60000) or 60000,
            max_sentences=hp.get("max_eval_sentences", 1) or 1)
        return BatchIterator(valid_ds, batches, pad_multiple=pad_multiple)

    def validate(self, state, valid_ds, pad_multiple: int = 128) -> float:
        # every process runs the (identical, deterministic) validation —
        # the SPMD program over global arrays needs all hosts to
        # participate — but only process 0 logs/plots
        losses = []
        num_plots = int(self.hp.get("num_valid_plots", 10))
        multihost = jax.process_count() > 1
        for i, batch in enumerate(self._val_batches(valid_ds, pad_multiple)):
            loss = float(self.task.val_step(state["params"], batch, self.rng))
            if np.isfinite(loss):
                losses.append(loss)
            elif self.is_proc0:
                # NaN-skip in the loss meter (reference
                # training/task/base_task.py:108-109)
                print(f"| WARNING: non-finite val loss on batch {i}, "
                      "excluded from the mean")
            if i < num_plots:
                # full sampling runs on EVERY process (identical inputs on
                # globally-replicated params keep the per-process SPMD
                # programs convergent); only process 0 has a writer and
                # renders/logs the figures and audio
                self._plot_validation(state, batch, i)
        val_loss = float(np.mean(losses)) if losses else float("nan")
        self._log("val", {"loss": val_loss, "mel": val_loss}, self.global_step)
        if self.is_proc0:
            print(f"| val step {self.global_step}: loss {val_loss:.4f}")
        return val_loss

    def _plot_validation(self, state, batch, idx: int):
        """Full sampling + audio/mel logging (SVC_task.py:127-160,212-221).

        Multi-host: the sampling itself must run on all processes (it is a
        computation over globally-replicated params), so the writer check
        comes AFTER it — returning early on non-0 processes before the
        compute would diverge the SPMD programs.  Single-process with no
        writer (tensorboard unavailable) there is no such constraint, and
        sampling would be computed only to be discarded — skip it."""
        import jax

        if self.writer is None and jax.process_count() == 1:
            return
        try:
            sample_params = state.get("ema_params", state["params"])
            out = self.task.sample(sample_params, batch, self.rng)
            if self.writer is None:
                return
            mel_pred = np.asarray(out["mel_out"][0])
            mel_gt = np.asarray(batch["mels"][0])
            from ..utils.plot import spec_to_figure

            self.writer.add_figure(f"mel_{idx}", spec_to_figure(mel_pred, mel_gt),
                                   self.global_step)
            vocoder = getattr(self, "vocoder", None)
            if vocoder is not None:
                f0 = np.asarray(out["f0_denorm"][0])
                wav = vocoder.spec2wav(mel_pred, f0=f0)
                self.writer.add_audio(f"wav_{idx}", wav[None, :], self.global_step,
                                      self.hp["audio_sample_rate"])
        except Exception as e:
            print(f"| plot_validation skipped: {e}")
