"""Inverse checkpoint exporter: framework params -> reference torch format.

Models trained here can be consumed by the reference ecosystem (and vice
versa): this writes a ``model_ckpt_steps_N.ckpt`` whose ``state_dict`` uses
the reference's parameter names/layouts (``model.fs2.*`` /
``model.denoise_fn.*``), the exact inverse of
``convert_torch.convert_gaussian_diffusion``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(a):
    import torch

    return torch.from_numpy(np.asarray(a))


def _linear(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(np.asarray(p["w"]).T)
    if "b" in p:
        sd[f"{prefix}.bias"] = _t(p["b"])


def _conv1d(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(np.asarray(p["w"]).transpose(2, 1, 0))
    if "b" in p:
        sd[f"{prefix}.bias"] = _t(p["b"])


def export_gaussian_diffusion(params: Dict, hp, out_path: str,
                              epoch: int = 0, global_step: int = 0) -> str:
    import jax
    import torch

    sd: Dict = {}
    fs2 = params["fs2"]
    _linear(sd, "model.fs2.mel_out", fs2["mel_out"])
    if "pitch_embed" in fs2:
        sd["model.fs2.pitch_embed.weight"] = _t(fs2["pitch_embed"])
    if "energy_embed" in fs2:
        sd["model.fs2.energy_embed.weight"] = _t(fs2["energy_embed"])
    if "spk_embed_proj" in fs2:
        p = fs2["spk_embed_proj"]
        if isinstance(p, dict):
            _linear(sd, "model.fs2.spk_embed_proj", p)
        else:
            sd["model.fs2.spk_embed_proj.weight"] = _t(p)

    dn = params["denoise_fn"]
    _conv1d(sd, "model.denoise_fn.input_projection", dn["input_projection"])
    _linear(sd, "model.denoise_fn.mlp.0", dn["mlp"]["w1"])
    _linear(sd, "model.denoise_fn.mlp.2", dn["mlp"]["w2"])
    _conv1d(sd, "model.denoise_fn.skip_projection", dn["skip_projection"])
    _conv1d(sd, "model.denoise_fn.output_projection", dn["output_projection"])
    # unstack the [L, ...] layer pytree
    n_layers = int(np.asarray(
        jax.tree.leaves(dn["layers"])[0]).shape[0])
    for i in range(n_layers):
        li = jax.tree.map(lambda a: np.asarray(a)[i], dn["layers"])
        pfx = f"model.denoise_fn.residual_layers.{i}"
        _conv1d(sd, f"{pfx}.dilated_conv", li["dilated_conv"])
        _linear(sd, f"{pfx}.diffusion_projection", li["diffusion_projection"])
        _conv1d(sd, f"{pfx}.conditioner_projection", li["conditioner_projection"])
        _conv1d(sd, f"{pfx}.output_projection", li["output_projection"])

    torch.save({"state_dict": sd, "epoch": epoch, "global_step": global_step,
                "checkpoint_callback_best": None, "optimizer_states": None,
                "lr_schedulers": None}, out_path)
    return out_path


if __name__ == "__main__":
    # CLI: convert a framework checkpoint back to reference torch format
    # (so the reference's own tooling, e.g. its onnx_export.py, can consume
    # it — see doc/export.md "Why not ONNX artifacts").
    import argparse

    from ..config.hparams import set_hparams
    from ..training import checkpoint as ckpt_lib

    ap = argparse.ArgumentParser()
    ap.add_argument("--project", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    config = args.config or f"./checkpoints/{args.project}/config.yaml"
    hp = set_hparams(config=config, exp_name=args.project, reset=False,
                     infer=True, print_hparams=False)
    params = ckpt_lib.load_params_for_infer(f"./checkpoints/{args.project}")
    path = export_gaussian_diffusion(params, hp, args.out)
    print(f"| wrote reference-format checkpoint: {path}")
