"""SVC training task: model + optimizer + jitted train/val steps.

Parity targets: reference ``training/task/SVC_task.py`` (GaussianDiffusion
with the wavenet decoder, AdamW betas (0.9, 0.98), StepLR halving every
``decay_steps``, diffusion loss as the 'mel' loss, validation that runs full
sampling for the first ``num_valid_plots`` batches) on top of the trainer
semantics of ``utils/pl_utils.py``.

TPU design: one jitted ``train_step`` over a ``Mesh(('data',))`` — batch
sharded, params/opt-state replicated, gradient mean = global batch mean
(XLA inserts the ICI all-reduce). Gradient accumulation via
``optax.MultiSteps``; clip-by-global-norm inside the chain.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..config.hparams import HParams
from ..models.diffusion import GaussianDiffusion
from .scheduler import build_lr_schedule


class SVCTask:
    def __init__(self, hp: HParams, mesh=None):
        self.hp = hp
        self.model = GaussianDiffusion(hp)
        self.mesh = mesh
        self.lr_schedule = build_lr_schedule(hp)
        self.accumulate = int(hp.get("accumulate_grad_batches", 1) or 1)
        self.tx = self._build_optimizer()
        self._train_step = None
        self._val_step = None
        self._resident = None
        self._resident_steps = {}

    # ------------------------------------------------------------------
    def _build_optimizer(self):
        hp = self.hp
        b1 = float(hp.get("optimizer_adam_beta1", 0.9))
        b2 = float(hp.get("optimizer_adam_beta2", 0.98))
        name = str(hp.get("optimizer", "adamw")).lower()
        if name == "radam":
            # reference vendors RAdam for PWG training
            # (modules/parallel_wavegan/optimizers/radam.py); optax has it.
            opt = optax.radam(self.lr_schedule, b1=b1, b2=b2)
        elif name in ("adamw", "adam"):
            opt = optax.adamw(
                self.lr_schedule, b1=b1, b2=b2,
                weight_decay=float(hp.get("weight_decay", 0) or 0.0))
        else:
            raise ValueError(f"unknown optimizer: {name!r}")
        tx = optax.chain(
            optax.clip_by_global_norm(float(hp.get("clip_grad_norm", 1) or 1e9)),
            opt,
        )
        if self.accumulate > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=self.accumulate)
        return tx

    def init_state(self, seed: Optional[int] = None) -> Dict:
        seed = seed if seed is not None else self.hp.get("seed", 1234)
        params = self.model.init_params(jax.random.PRNGKey(seed))
        state = {"params": params, "opt_state": self.tx.init(params),
                 "step": jnp.zeros((), jnp.int32)}
        if float(self.hp.get("ema_decay", 0) or 0) > 0:
            # EMA of params for sampling (not in the reference; diffusion
            # models sample noticeably better from averaged weights).
            # Materialized copies: params buffers are donated by train_step.
            state["ema_params"] = jax.tree.map(lambda a: jnp.array(a, copy=True),
                                               params)
        return state

    def load_params_into_state(self, state: Dict, params) -> Dict:
        state = dict(state)
        state["params"] = jax.tree.map(jnp.asarray, params)
        if "ema_params" in state:
            # warm start: the EMA must track the LOADED weights, not the
            # fresh random init it was built from (otherwise validation
            # audio / best-checkpoint EMA weights start as noise for
            # ~1/(1-decay) steps)
            state["ema_params"] = jax.tree.map(
                lambda a: jnp.array(a, copy=True), state["params"])
        return state

    # ------------------------------------------------------------------
    def _make_train_step(self):
        model = self.model
        tx = self.tx
        lr_schedule = self.lr_schedule
        accumulate = self.accumulate

        # Matmul/conv precision for the train step. TPU default ("default")
        # is bf16-multiply/fp32-accumulate on the MXU — measured 77 ms/step
        # vs 177 ms for full-fp32 "highest" at 44.1 kHz production dims
        # (tools/bench_train.py on v5e-1), with indistinguishable loss.
        # Exposed for precision-sensitive runs: "highest" | "bfloat16" | ...
        precision = self.hp.get("train_matmul_precision") or "default"
        print_nan_grads = bool(self.hp.get("print_nan_grads"))

        def train_step(state, batch, rng):
            rng = jax.random.fold_in(rng, state["step"])

            def loss_fn(params):
                with jax.default_matmul_precision(precision):
                    loss, _ = model.training_loss(params, batch, rng)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            if print_nan_grads:
                # debug affordance for diverging runs (reference
                # print_nan_gradients, utils/pl_utils.py:1086-1090): report
                # each parameter whose gradient went non-finite. Trace-time
                # flag — zero cost when off (the default).
                from jax.tree_util import keystr, tree_flatten_with_path

                for path, g in tree_flatten_with_path(grads)[0]:
                    name = keystr(path)
                    jax.lax.cond(
                        jnp.all(jnp.isfinite(g)),
                        lambda: None,
                        lambda n=name: jax.debug.print(
                            "| WARNING: non-finite grad in {n} at step {s} "
                            "(loss={l})", n=n, s=state["step"], l=loss))
            updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            new_state = {"params": params, "opt_state": opt_state,
                         "step": state["step"] + 1}
            if "ema_params" in state:
                d = float(self.hp.get("ema_decay"))
                new_state["ema_params"] = jax.tree.map(
                    lambda e, p: d * e + (1.0 - d) * p,
                    state["ema_params"], params)
            metrics = {
                "loss": loss,
                "mel": loss,  # the diffusion loss is the 'mel' loss
                "lr": lr_schedule(state["step"] // accumulate),
                "grad_norm": optax.global_norm(grads),
            }
            return new_state, metrics

        self._raw_step = train_step
        # declare the mesh for the fused pallas train kernel: on a
        # data-only mesh models/diffnet.py wraps it in shard_map instead
        # of forfeiting it to the scan (read at trace time). Declared
        # UNCONDITIONALLY: a mesh-less task must clear any mesh a
        # previous task in the same process installed, or its traces
        # would shard_map over devices it never declared.
        from ..models import diffnet as _diffnet

        _diffnet.set_train_mesh(self.mesh)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            batch_spec = self.batch_shardings()
            self._batch_spec = batch_spec
            return jax.jit(
                train_step,
                in_shardings=(repl, batch_spec, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            ), set(batch_spec)
        self._batch_spec = None
        return jax.jit(train_step, donate_argnums=(0,)), None

    def batch_shardings(self):
        """Per-key batch shardings: batch axis on 'data'; when the mesh has a
        'seq' axis, the mel/unit time axes are sharded too (sequence
        parallelism — XLA inserts the halo exchanges the dilated convs and
        the mel2ph gather need)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        has_seq = "seq" in self.mesh.axis_names
        seq = "seq" if has_seq else None
        spec = {
            "hubert": P("data", seq, None),
            "mels": P("data", seq, None),
            "mel2ph": P("data", seq),
            "energy": P("data", seq),
            "f0": P("data", seq),
            "uv": P("data", seq),
            "sample_mask": P("data"),
        }
        if self.hp.get("use_spk_id"):
            spec["spk_embed"] = P("data")
        return {k: NamedSharding(self.mesh, v) for k, v in spec.items()}

    def train_step(self, state, batch, rng):
        if self._train_step is None:
            self._train_step, self._batch_keys = self._make_train_step()
        jb = self.prepare_batch(batch)
        if self._batch_keys is not None:
            # align the batch pytree with the sharding spec structure
            b = jb.get("mels")
            if "sample_mask" in self._batch_keys and "sample_mask" not in jb:
                import jax.numpy as jnp

                jb["sample_mask"] = jnp.ones((b.shape[0],), jnp.float32)
            jb = {k: jb[k] for k in self._batch_keys}
            if jax.process_count() > 1:
                # multi-host: assemble global arrays from the (identical)
                # host-local batch — jit can't place numpy onto
                # non-addressable devices
                from ..parallel.mesh import make_global_batch

                jb = make_global_batch(jb, self._batch_spec)
        return self._train_step(state, jb, rng)

    # ------------------------------------------------------------------
    def _make_val_step(self):
        model = self.model
        precision = self.hp.get("train_matmul_precision") or "default"

        def val_step(params, batch, rng):
            with jax.default_matmul_precision(precision):
                loss, _ = model.training_loss(params, batch, rng, train=False)
            return loss

        return jax.jit(val_step)

    def val_step(self, params, batch, rng):
        if self._val_step is None:
            self._val_step = self._make_val_step()
        # eval batches are small (max_eval_sentences) — run replicated
        jb = self.prepare_batch(batch, shard=False)
        if jax.process_count() > 1 and self.mesh is not None:
            # multi-host: params are global arrays, so the batch must be
            # global too — replicate it (every host holds the same bytes)
            from ..parallel.mesh import make_global_batch, replicated

            repl = replicated(self.mesh)
            jb = make_global_batch(jb, {k: repl for k in jb})
        return self._val_step(params, jb, rng)

    def sample(self, params, batch, rng, speedup: Optional[int] = None):
        """Full sampling for validation plots (not jit-cached across shapes).
        Multi-host: runs on every process over the replicated global batch
        (same bytes everywhere) so the SPMD programs stay convergent; the
        trainer writes plots on process 0 only."""
        jb = self.prepare_batch(batch, shard=False)
        if jax.process_count() > 1 and self.mesh is not None:
            from ..parallel.mesh import make_global_batch, replicated

            repl = replicated(self.mesh)
            jb = make_global_batch(
                jb, {k: repl for k in jb if hasattr(jb[k], "shape")})
        return self.model.infer(params, jb, rng, speedup=speedup
                                or self.hp.get("pndm_speedup", 10) or 10)

    # ------------------------------------------------------------------
    def prepare_batch(self, batch: Dict, shard: bool = True) -> Dict:
        # placement/sharding is handled by the jitted step's in_shardings
        keys = ("hubert", "mels", "mel2ph", "energy", "f0", "uv", "sample_mask")
        jb = {k: batch[k] for k in keys if batch.get(k) is not None}
        if self.hp.get("use_spk_id") and "spk_ids" in batch:
            jb["spk_embed"] = batch["spk_ids"]
        return jb

    def put_batch(self, batch: Dict) -> Dict:
        """Start the host->device transfer of a batch NOW (async), placed
        exactly where the jitted step's ``in_shardings`` expect it, so the
        upload overlaps device compute instead of serializing with the next
        dispatch. Called from the Trainer's prefetch thread; on the
        tunneled TPU the per-step batch upload (~MBs at tunnel bandwidth)
        otherwise sits on the critical path of every step. Single-process
        only (multi-host assembles global arrays in ``train_step``)."""
        jb = self.prepare_batch(batch)
        if self.mesh is not None:
            spec = self.batch_shardings()
            if "sample_mask" in spec and "sample_mask" not in jb:
                import numpy as np

                jb["sample_mask"] = np.ones((jb["mels"].shape[0],), np.float32)
            put = {k: jax.device_put(v, spec[k]) for k, v in jb.items()
                   if k in spec}
        else:
            put = {k: jax.device_put(v) for k, v in jb.items()}
        out = dict(batch)
        out.update(put)
        return out

    # ------------------------------------------------------------------
    # Device-resident dataset mode (``resident_dataset: true``): the whole
    # binarized split lives in HBM (features concatenated along time,
    # replicated over the mesh) and each step ships only per-sample
    # offsets/lengths — a few dozen BYTES — while the jitted step gathers
    # and zero-masks the batch on device, reproducing the host collate
    # (features.processed_input2batch) bit-for-bit. This removes the
    # MB-scale per-step batch upload, which dominates the loop wherever
    # host->device transfers serialize with dispatches (the tunneled chip
    # runs ~300 ms/step at small batches on the host pipeline,
    # runs/train_loop/). Single-process only; validation keeps the host
    # path (it runs rarely and wants full-length utterances).

    def build_resident(self, dataset, pad_multiple: int = 128) -> int:
        """Upload every training sample's features to device once.
        Returns the resident size in bytes (for logging/gating)."""
        import numpy as np

        mels, hubs, m2ph, energy, f0, uv, spk = [], [], [], [], [], [], []
        for i in range(len(dataset)):
            s = dataset[i]
            if s["mel2ph"] is None:
                raise ValueError("resident_dataset requires alignment "
                                 "(mel2ph) in the binarized data")
            mels.append(np.asarray(s["mel"], np.float32))
            hubs.append(np.asarray(s["hubert"], np.float32))
            m2ph.append(np.asarray(s["mel2ph"], np.int32))
            energy.append(np.asarray(s["energy"], np.float32))
            f0.append(np.asarray(s["f0"], np.float32))
            uv.append(np.asarray(s["uv"], np.float32))
            spk.append(int(s.get("spk_id", 0)))
        mel_len = np.array([m.shape[0] for m in mels], np.int32)
        hub_len = np.array([h.shape[0] for h in hubs], np.int32)

        def rnd(n):
            return -(-int(n) // pad_multiple) * pad_multiple

        # tail padding >= the largest bucket so dynamic_slice never clamps
        # (a clamped start would read a neighbor's rows before the mask)
        max_t, max_u = rnd(mel_len.max()), rnd(hub_len.max())

        def cat(xs, tail):
            flat = np.concatenate(xs, 0)
            pad = [(0, tail)] + [(0, 0)] * (flat.ndim - 1)
            return np.pad(flat, pad)

        flats = {
            "mel": cat(mels, max_t), "hubert": cat(hubs, max_u),
            "mel2ph": cat(m2ph, max_t), "energy": cat(energy, max_t),
            "f0": cat(f0, max_t), "uv": cat(uv, max_t),
        }
        nbytes = sum(int(v.nbytes) for v in flats.values())
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            flats = {k: jax.device_put(v, repl) for k, v in flats.items()}
        else:
            flats = {k: jax.device_put(v) for k, v in flats.items()}
        off = lambda lens: np.concatenate(
            [[0], np.cumsum(lens)[:-1]]).astype(np.int32)
        self._resident = dict(
            flats=flats, mel_off=off(mel_len), mel_len=mel_len,
            hub_off=off(hub_len), hub_len=hub_len,
            spk=np.array(spk, np.int32), pad_multiple=int(pad_multiple))
        self._resident_steps = {}
        return nbytes

    # packed meta columns: one [B, 5] int32 array per step — a SINGLE
    # host->device transfer. On the tunneled chip every transfer is a
    # full round trip (~30 ms) regardless of size, so the per-step wire
    # must be one array, not five (runs/train_loop/: 5 tiny arrays cost
    # the same ~264 ms/step as the full host batch).
    _META_COLS = ("mel_off", "mel_len", "hub_off", "hub_len", "spk")

    def _resident_gather(self, flats, meta, t_mel: int, t_hub: int) -> Dict:
        """[flat arrays] + packed [B,5] meta -> the exact collated batch:
        per-sample static-size dynamic_slice (vmap -> one gather), rows at
        t >= len zeroed like collate_1d/2d's pad_value. sample_mask is
        derived on device: real samples have mel_len >= 1, batch-axis pad
        rows have mel_len == 0."""
        from jax import lax

        def sl2(flat, T):
            def one(o, n):
                x = lax.dynamic_slice(flat, (o, 0), (T, flat.shape[1]))
                return jnp.where(jnp.arange(T)[:, None] < n, x, 0)

            return jax.vmap(one)

        def sl1(flat, T):
            def one(o, n):
                x = lax.dynamic_slice(flat, (o,), (T,))
                return jnp.where(jnp.arange(T) < n, x, 0)

            return jax.vmap(one)

        mo, ml = meta[:, 0], meta[:, 1]
        jb = {
            "mels": sl2(flats["mel"], t_mel)(mo, ml),
            "hubert": sl2(flats["hubert"], t_hub)(meta[:, 2], meta[:, 3]),
            "mel2ph": sl1(flats["mel2ph"], t_mel)(mo, ml),
            "energy": sl1(flats["energy"], t_mel)(mo, ml),
            "f0": sl1(flats["f0"], t_mel)(mo, ml),
            "uv": sl1(flats["uv"], t_mel)(mo, ml),
            "sample_mask": (ml > 0).astype(jnp.float32),
        }
        if self.hp.get("use_spk_id"):
            jb["spk_embed"] = meta[:, 4]
        return jb

    def _make_resident_step(self, t_mel: int, t_hub: int):
        if self._train_step is None:
            self._train_step, self._batch_keys = self._make_train_step()
        raw = self._raw_step
        keys = self._batch_keys

        def step(state, flats, meta, rng):
            jb = self._resident_gather(flats, meta, t_mel, t_hub)
            if keys is not None:
                jb = {k: jb[k] for k in keys}
                # pin the gathered batch to the host path's in_shardings so
                # the step subgraph compiles identically (parity + the same
                # seq-axis halo behavior)
                jb = jax.lax.with_sharding_constraint(jb, self._batch_spec)
            return raw(state, jb, rng)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data", None))
            flats_sh = {k: repl for k in self._resident["flats"]}
            return jax.jit(step, in_shardings=(repl, flats_sh, data, repl),
                           out_shardings=(repl, repl), donate_argnums=(0,))
        return jax.jit(step, donate_argnums=(0,))

    def train_step_resident(self, state, idxs, rng):
        """One training step from sample indices (host wire: ~6 int32/f32
        values per sample). Pads the batch axis up to the data-parallel
        multiple with zero-length masked samples, exactly like the host
        path's ``_pad_batch_dim`` + ``sample_mask``."""
        import numpy as np

        r = self._resident
        if r is None:
            raise RuntimeError("call build_resident() before "
                               "train_step_resident()")
        idxs = np.asarray(idxs, np.int64)
        b_real = int(idxs.shape[0])
        world = 1
        if self.mesh is not None:
            world = int(self.mesh.shape.get("data", 1))
        b = -(-b_real // world) * world
        pm = r["pad_multiple"]

        def rnd(n):
            return -(-int(n) // pm) * pm

        t_mel = rnd(r["mel_len"][idxs].max())
        t_hub = rnd(r["hub_len"][idxs].max())

        meta = np.zeros((b, len(self._META_COLS)), np.int32)
        for j, col in enumerate(self._META_COLS):
            meta[:b_real, j] = r[col][idxs]
        key = (b, t_mel, t_hub)
        fn = self._resident_steps.get(key)
        if fn is None:
            fn = self._resident_steps[key] = self._make_resident_step(
                t_mel, t_hub)
        return fn(state, r["flats"], meta, rng)

    def _make_resident_chunk(self, t_mel: int, t_hub: int):
        if self._train_step is None:
            self._train_step, self._batch_keys = self._make_train_step()
        raw = self._raw_step
        keys = self._batch_keys

        def chunk(state, flats, metas, rng):
            def body(st, meta):
                jb = self._resident_gather(flats, meta, t_mel, t_hub)
                if keys is not None:
                    jb = {kk: jb[kk] for kk in keys}
                    jb = jax.lax.with_sharding_constraint(jb,
                                                          self._batch_spec)
                return raw(st, jb, rng)

            return jax.lax.scan(body, state, metas)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            metas_sh = NamedSharding(self.mesh, P(None, "data", None))
            flats_sh = {kk: repl for kk in self._resident["flats"]}
            return jax.jit(chunk,
                           in_shardings=(repl, flats_sh, metas_sh, repl),
                           out_shardings=(repl, repl), donate_argnums=(0,))
        return jax.jit(chunk, donate_argnums=(0,))

    def train_chunk_resident(self, state, idx_chunks, rng):
        """Run ``len(idx_chunks)`` consecutive steps in ONE dispatch: the
        chunk's packed metas ship as a single [k, B, 5] upload and the
        steps run in an on-device ``lax.scan`` — per-step tunnel round
        trips amortize away (the host touches the device once per chunk).
        All batches in the chunk share one (B, T_mel, T_hub) bucket (the
        chunk max, rounded to pad_multiple): identical zero-pad semantics
        to the reference's pad-to-longest collate, one bucket coarser.
        The per-step RNG stream is unchanged (each scan iteration folds
        the step counter exactly like the single-step path). Returns
        (state, metrics) with metrics leaves stacked [k]."""
        import numpy as np

        r = self._resident
        if r is None:
            raise RuntimeError("call build_resident() before "
                               "train_chunk_resident()")
        world = 1
        if self.mesh is not None:
            world = int(self.mesh.shape.get("data", 1))
        pm = r["pad_multiple"]

        def rnd(n):
            return -(-int(n) // pm) * pm

        k = len(idx_chunks)
        idx_arrs = [np.asarray(ix, np.int64) for ix in idx_chunks]
        b = max(-(-int(ix.shape[0]) // world) * world for ix in idx_arrs)
        t_mel = rnd(max(int(r["mel_len"][ix].max()) for ix in idx_arrs))
        t_hub = rnd(max(int(r["hub_len"][ix].max()) for ix in idx_arrs))
        metas = np.zeros((k, b, len(self._META_COLS)), np.int32)
        for i, ix in enumerate(idx_arrs):
            for j, col in enumerate(self._META_COLS):
                metas[i, : ix.shape[0], j] = r[col][ix]
        key = ("chunk", k, b, t_mel, t_hub)
        fn = self._resident_steps.get(key)
        if fn is None:
            fn = self._resident_steps[key] = self._make_resident_chunk(
                t_mel, t_hub)
        return fn(state, r["flats"], metas, rng)
