"""PitchExtractionTask: trains the mel->f0 PitchExtractor.

Parity target: reference ``training/pe.py`` — PeDataset (mel/f0/uv/pitch
fields only), f0 L2 + uv BCE losses masked by mel nonpadding, StepLR/AdamW
as configured, validation f0 plots.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..config.hparams import HParams
from ..models import pe as pe_model
from ..parallel import mesh as mesh_lib
from .scheduler import build_lr_schedule


def f0_uv_losses(pitch_pred, f0, uv, nonpadding, *, lambda_f0=1.0,
                 lambda_uv=1.0, use_uv=True, pitch_loss="l2"):
    """f0 regression + uv classification losses (reference fs2 add_f0_loss
    semantics: uv BCE over nonpadding; f0 loss over voiced nonpadding)."""
    losses = {}
    if use_uv:
        logits = pitch_pred[:, :, 1]
        bce = optax.sigmoid_binary_cross_entropy(logits, uv)
        losses["uv"] = (bce * nonpadding).sum() / jnp.maximum(nonpadding.sum(), 1) \
            * lambda_uv
        nonpadding = nonpadding * (uv == 0).astype(nonpadding.dtype)
    diff = pitch_pred[:, :, 0] - f0
    err = jnp.abs(diff) if pitch_loss == "l1" else diff**2
    losses["f0"] = (err * nonpadding).sum() / jnp.maximum(nonpadding.sum(), 1) \
        * lambda_f0
    return losses


class PitchExtractionTask:
    def __init__(self, hp: HParams, mesh=None):
        self.hp = hp
        self.mesh = mesh
        self.cfg = pe_model.PEConfig.from_hparams(hp)
        self.cfg = self.cfg._replace(
            conv_layers=int(hp.get("pitch_extractor_conv_layers", 2)))
        self.lr_schedule = build_lr_schedule(hp)
        self.accumulate = int(hp.get("accumulate_grad_batches", 1) or 1)
        self.tx = optax.chain(
            optax.clip_by_global_norm(float(hp.get("clip_grad_norm", 1) or 1e9)),
            optax.adamw(self.lr_schedule,
                        b1=float(hp.get("optimizer_adam_beta1", 0.9)),
                        b2=float(hp.get("optimizer_adam_beta2", 0.98)),
                        weight_decay=float(hp.get("weight_decay", 0) or 0.0)))
        if self.accumulate > 1:
            self.tx = optax.MultiSteps(self.tx, every_k_schedule=self.accumulate)
        self._train_step = None
        self._val_step = None

    def init_state(self, seed: Optional[int] = None) -> Dict:
        seed = seed if seed is not None else self.hp.get("seed", 1234)
        params = pe_model.init(jax.random.PRNGKey(seed), self.cfg)
        return {"params": params, "opt_state": self.tx.init(params),
                "step": jnp.zeros((), jnp.int32)}

    def load_params_into_state(self, state, params):
        state = dict(state)
        state["params"] = jax.tree.map(jnp.asarray, params)
        return state

    def _loss(self, params, batch):
        out = pe_model.apply(params, self.cfg, batch["mels"])
        nonpadding = (jnp.abs(batch["mels"]).sum(-1) > 0).astype(jnp.float32)
        if batch.get("sample_mask") is not None:
            nonpadding = nonpadding * batch["sample_mask"][:, None]
        losses = f0_uv_losses(
            out["pitch_pred"], batch["f0"], batch["uv"], nonpadding,
            lambda_f0=float(self.hp.get("lambda_f0", 1.0)),
            lambda_uv=float(self.hp.get("lambda_uv", 1.0)),
            use_uv=self.cfg.pitch_type == "frame",
            pitch_loss=self.hp.get("pitch_loss", "l2"))
        return sum(losses.values()), losses

    def _make_train_step(self):
        tx = self.tx
        lr_schedule = self.lr_schedule
        accumulate = self.accumulate

        def train_step(state, batch, rng):
            (loss, losses), grads = jax.value_and_grad(
                lambda p: self._loss(p, batch), has_aux=True)(state["params"])
            updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            metrics = {"loss": loss, **losses,
                       "lr": lr_schedule(state["step"] // accumulate),
                       "grad_norm": optax.global_norm(grads)}
            return ({"params": params, "opt_state": opt_state,
                     "step": state["step"] + 1}, metrics)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            return jax.jit(train_step, in_shardings=(repl, data, repl),
                           out_shardings=(repl, repl), donate_argnums=(0,))
        return jax.jit(train_step, donate_argnums=(0,))

    def train_step(self, state, batch, rng):
        if self._train_step is None:
            self._train_step = self._make_train_step()
        return self._train_step(state, self.prepare_batch(batch), rng)

    def val_step(self, params, batch, rng):
        if self._val_step is None:
            self._val_step = jax.jit(lambda p, b: self._loss(p, b)[0])
        return self._val_step(params, self.prepare_batch(batch, shard=False))

    def sample(self, params, batch, rng, speedup=None):
        jb = self.prepare_batch(batch, shard=False)
        out = pe_model.apply(params, self.cfg, jb["mels"])
        out["mel_out"] = jb["mels"]  # for the generic plot path
        out["f0_denorm"] = out["f0_denorm_pred"]
        return out

    def prepare_batch(self, batch: Dict, shard: bool = True) -> Dict:
        keys = ("mels", "f0", "uv", "pitch", "sample_mask")
        jb = {k: batch[k] for k in keys if batch.get(k) is not None}
        if shard and self.mesh is not None:
            jb = mesh_lib.shard_batch(self.mesh, jb)
        return jb
