"""ContentVec content encoder (fairseq-HuBERT checkpoint converter).

Parity target: reference ``network/hubert/vec_model.py`` — loads
``checkpoint_best_legacy_500.pt`` via fairseq and taps layer-9 features then
``final_proj`` -> [T, 256] units (hubertinfer.py ``use_vec`` path).

The trunk is the same as HuBERT-soft (models/hubert.py): 7-conv frontend,
conv positional embedding, post-LN transformer. This module converts the
fairseq parameter naming onto that pytree, so no separate forward code is
needed; only the layer tap (9) and the final projection differ.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import numpy as np

from . import hubert as hubert_model
from . import nn

OUTPUT_LAYER = 9  # vec_model.py:40 "output_layer": 9


def convert_fairseq(sd: Dict[str, np.ndarray],
                    cfg: hubert_model.HubertConfig = hubert_model.HubertConfig()
                    ) -> Dict:
    """fairseq HubertModel state dict -> hubert params pytree (+final_proj)."""
    from ..utils import convert_torch as cvt

    sd = cvt.fold_weight_norm(sd)
    fe = {"conv0": cvt.conv1d(sd, "feature_extractor.conv_layers.0.0", bias=False),
          "norm0": {"scale": sd["feature_extractor.conv_layers.0.2.weight"].astype(np.float32),
                    "bias": sd["feature_extractor.conv_layers.0.2.bias"].astype(np.float32)}}
    for i in range(1, 7):
        fe[f"conv{i}"] = cvt.conv1d(sd, f"feature_extractor.conv_layers.{i}.0",
                                    bias=False)
    layers = []
    for i in range(cfg.num_layers):
        pfx = f"encoder.layers.{i}"
        layers.append({
            "attn": {
                "q": cvt.linear(sd, f"{pfx}.self_attn.q_proj"),
                "k": cvt.linear(sd, f"{pfx}.self_attn.k_proj"),
                "v": cvt.linear(sd, f"{pfx}.self_attn.v_proj"),
                "out": cvt.linear(sd, f"{pfx}.self_attn.out_proj"),
            },
            "ln1": cvt.layer_norm(sd, f"{pfx}.self_attn_layer_norm"),
            "ffn": {"w1": cvt.linear(sd, f"{pfx}.fc1"),
                    "w2": cvt.linear(sd, f"{pfx}.fc2")},
            "ln2": cvt.layer_norm(sd, f"{pfx}.final_layer_norm"),
        })
    params = {
        "feature_extractor": fe,
        "feature_projection": {
            "norm": cvt.layer_norm(sd, "layer_norm"),
            "projection": cvt.linear(sd, "post_extract_proj")},
        "positional_embedding": {"conv": cvt.conv1d(sd, "encoder.pos_conv.0")},
        "norm": cvt.layer_norm(sd, "encoder.layer_norm"),
        "encoder": layers,
        "proj": cvt.linear(sd, "final_proj"),
    }
    return params


def load(pt_path: str, cfg: hubert_model.HubertConfig = hubert_model.HubertConfig()):
    """Load a fairseq ContentVec checkpoint (torch pickle with 'model')."""
    from ..utils import convert_torch as cvt

    ckpt = cvt.torch_load(pt_path)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    sd = {k: cvt._to_np(v) for k, v in sd.items()}
    return convert_fairseq(sd, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def units(params, cfg: hubert_model.HubertConfig, wav16k):
    """ContentVec units: layer-9 features -> final_proj -> [B, T, 256].

    Unlike HuBERT-soft there is no (400-320)/2 waveform pad."""
    x = hubert_model.encode(params, cfg, wav16k, output_layer=OUTPUT_LAYER)
    return nn.linear(params["proj"], x)
