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
