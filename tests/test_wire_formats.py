"""Exact wire-format fixture tests for the torch-checkpoint converters
(VERDICT r3 #6).

The real ecosystem weight files (torchcrepe ``full.pth``, the hubert-soft
``hubert_soft.pt``, the fairseq ContentVec ``checkpoint_best_legacy_500.pt``)
do not exist in this environment, so every converter was previously tested
against state dicts the tests themselves invented.  These tests construct
checkpoints with the EXACT key sets, tensor shapes, container layouts and
quirks (DDP ``module.`` prefixes, dim=2 weight-norm splits, fairseq wrapper
dicts with argparse Namespaces, extra keys like ``label_embs_concat``) of
the published formats, write them to disk with ``torch.save``, and run the
repo's load path end-to-end against a reference-architecture torch forward
with the same weights.

Layout sources:
- torchcrepe full.pth: raw ``state_dict`` of torchcrepe.Crepe('full')
  (conv1..conv6 + conv{i}_BN + classifier) — the chain the reference calls
  in preprocessing/data_gen_utils.py:191-230.
- hubert_soft.pt: raw state dict of network/hubert/hubert_model.py's
  HubertSoft (the module itself is imported from /root/reference, so the
  key set is the reference's own, loaded via hubert_soft() :218-231).
- ContentVec: fairseq checkpoint wrapper {'args','model',...} with fairseq
  HubertModel parameter names (vec_model.py loads it through fairseq;
  hubertinfer.py:13-42 ``use_vec`` path).

The NSF-HiFiGAN openvpi directory format (config.json + {'generator': sd})
is covered by tests/test_nsf_wrapper.py.
"""

import os
import sys
import types
from argparse import Namespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

REF = "/root/reference"


# ---------------------------------------------------------------------------
# torchcrepe full.pth
# ---------------------------------------------------------------------------

class TorchCrepeFull(tnn.Module):
    """torchcrepe.Crepe('full') architecture with its exact parameter
    names; forward is the published conv->relu->BN->maxpool chain."""

    IN = [1, 1024, 128, 128, 128, 256]
    OUT = [1024, 128, 128, 128, 256, 512]

    def __init__(self):
        super().__init__()
        for i in range(6):
            k = (512, 1) if i == 0 else (64, 1)
            s = (4, 1) if i == 0 else (1, 1)
            setattr(self, f"conv{i + 1}",
                    tnn.Conv2d(self.IN[i], self.OUT[i], k, s))
            setattr(self, f"conv{i + 1}_BN", tnn.BatchNorm2d(self.OUT[i]))
        self.classifier = tnn.Linear(2048, 360)

    def forward(self, frames):
        x = frames[:, None, :, None]
        for i in range(6):
            pad = (0, 0, 254, 254) if i == 0 else (0, 0, 31, 32)
            x = F.pad(x, pad)
            x = getattr(self, f"conv{i + 1}")(x)
            x = F.relu(x)
            x = getattr(self, f"conv{i + 1}_BN")(x)
            x = F.max_pool2d(x, (2, 1), (2, 1))
        x = x.permute(0, 2, 1, 3).reshape(x.shape[0], -1)
        return torch.sigmoid(self.classifier(x))


def test_torchcrepe_full_pth_layout(tmp_path):
    """torchcrepe full.pth is a RAW state dict (incl. BatchNorm
    num_batches_tracked keys); load_crepe must consume it as-is and the
    JAX forward must match the torch architecture bit-for-bit-ish."""
    import jax.numpy as jnp

    from diffsvc_tpu.ops import crepe

    torch.manual_seed(0)
    m = TorchCrepeFull().eval()
    # non-trivial BN running stats so a mean/var mix-up cannot hide
    with torch.no_grad():
        for i in range(6):
            bn = getattr(m, f"conv{i + 1}_BN")
            bn.running_mean.normal_(0.0, 0.5)
            bn.running_var.uniform_(0.5, 2.0)
            bn.num_batches_tracked.fill_(12345)

    path = tmp_path / "full.pth"
    torch.save(m.state_dict(), str(path))

    # exact key-set assertion: what the real file contains, nothing less
    sd = torch.load(str(path), weights_only=True)
    expect = set()
    for i in range(1, 7):
        expect |= {f"conv{i}.weight", f"conv{i}.bias",
                   f"conv{i}_BN.weight", f"conv{i}_BN.bias",
                   f"conv{i}_BN.running_mean", f"conv{i}_BN.running_var",
                   f"conv{i}_BN.num_batches_tracked"}
    expect |= {"classifier.weight", "classifier.bias"}
    assert set(sd) == expect

    params = crepe.load_crepe(str(path))

    sr = 16000
    t = np.arange(sr // 2) / sr
    wav = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    frames = crepe.frame_audio(wav)
    probs_jax = np.asarray(crepe.forward(params, jnp.asarray(frames)))
    with torch.no_grad():
        probs_t = m(torch.from_numpy(np.asarray(frames))).numpy()
    assert probs_jax.shape == probs_t.shape == (len(frames), 360)
    np.testing.assert_allclose(probs_jax, probs_t, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# hubert_soft.pt (reference network/hubert/hubert_model.py layout)
# ---------------------------------------------------------------------------

@pytest.fixture()
def ref_hubert_module():
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not present")
    stubbed = []
    if "librosa" not in sys.modules:  # imported at hubert_model.py top
        sys.modules["librosa"] = types.ModuleType("librosa")
        stubbed.append("librosa")
    sys.path.insert(0, REF)
    before = set(sys.modules)
    try:
        from network.hubert.hubert_model import HubertSoft
        yield HubertSoft
    finally:
        sys.path.remove(REF)
        for k in [k for k in sys.modules if k not in before] + stubbed:
            sys.modules.pop(k, None)


def test_hubert_soft_pt_layout(ref_hubert_module, tmp_path):
    """Save the reference HubertSoft's own state dict (with the DDP
    'module.' prefix the published file carries from training) and run the
    repo's load path + units() against the reference torch units()."""
    import jax.numpy as jnp

    from diffsvc_tpu.models import hubert as jhub

    torch.manual_seed(1)
    ref = ref_hubert_module().eval()
    sd = {f"module.{k}": v for k, v in ref.state_dict().items()}
    path = tmp_path / "hubert_soft.pt"
    torch.save(sd, str(path))

    params = jhub.load(str(path))
    cfg = jhub.HubertConfig()

    rng = np.random.RandomState(2)
    wav = (rng.randn(16000) * 0.1).astype(np.float32)
    with torch.no_grad():
        units_t = ref.units(torch.from_numpy(wav)[None, None]).numpy()[0]
    units_j = np.asarray(jhub.units(params, cfg,
                                    jnp.asarray(wav)[None]))[0]
    assert units_j.shape == units_t.shape
    np.testing.assert_allclose(units_j, units_t, atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# ContentVec fairseq checkpoint
# ---------------------------------------------------------------------------

def _bshall_to_fairseq(sd):
    """Map the trunk weights onto fairseq HubertModel parameter names (the
    two modules implement the same math; fairseq stores separate q/k/v
    projections and different module paths)."""
    out = {}
    out["feature_extractor.conv_layers.0.0.weight"] = sd["feature_extractor.conv0.weight"]
    out["feature_extractor.conv_layers.0.2.weight"] = sd["feature_extractor.norm0.weight"]
    out["feature_extractor.conv_layers.0.2.bias"] = sd["feature_extractor.norm0.bias"]
    for i in range(1, 7):
        out[f"feature_extractor.conv_layers.{i}.0.weight"] = (
            sd[f"feature_extractor.conv{i}.weight"])
    out["layer_norm.weight"] = sd["feature_projection.norm.weight"]
    out["layer_norm.bias"] = sd["feature_projection.norm.bias"]
    out["post_extract_proj.weight"] = sd["feature_projection.projection.weight"]
    out["post_extract_proj.bias"] = sd["feature_projection.projection.bias"]
    # pos conv keeps its dim=2 weight-norm split on disk
    out["encoder.pos_conv.0.weight_g"] = sd["positional_embedding.conv.weight_g"]
    out["encoder.pos_conv.0.weight_v"] = sd["positional_embedding.conv.weight_v"]
    out["encoder.pos_conv.0.bias"] = sd["positional_embedding.conv.bias"]
    out["encoder.layer_norm.weight"] = sd["norm.weight"]
    out["encoder.layer_norm.bias"] = sd["norm.bias"]
    for i in range(12):
        src = f"encoder.layers.{i}"
        w = sd[f"{src}.self_attn.in_proj_weight"]
        b = sd[f"{src}.self_attn.in_proj_bias"]
        d = w.shape[0] // 3
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            out[f"{src}.self_attn.{name}.weight"] = w[j * d:(j + 1) * d]
            out[f"{src}.self_attn.{name}.bias"] = b[j * d:(j + 1) * d]
        out[f"{src}.self_attn.out_proj.weight"] = sd[f"{src}.self_attn.out_proj.weight"]
        out[f"{src}.self_attn.out_proj.bias"] = sd[f"{src}.self_attn.out_proj.bias"]
        out[f"{src}.self_attn_layer_norm.weight"] = sd[f"{src}.norm1.weight"]
        out[f"{src}.self_attn_layer_norm.bias"] = sd[f"{src}.norm1.bias"]
        out[f"{src}.fc1.weight"] = sd[f"{src}.linear1.weight"]
        out[f"{src}.fc1.bias"] = sd[f"{src}.linear1.bias"]
        out[f"{src}.fc2.weight"] = sd[f"{src}.linear2.weight"]
        out[f"{src}.fc2.bias"] = sd[f"{src}.linear2.bias"]
        out[f"{src}.final_layer_norm.weight"] = sd[f"{src}.norm2.weight"]
        out[f"{src}.final_layer_norm.bias"] = sd[f"{src}.norm2.bias"]
    out["final_proj.weight"] = sd["proj.weight"]
    out["final_proj.bias"] = sd["proj.bias"]
    # extra keys every real fairseq HubertModel checkpoint carries; the
    # converter must tolerate them
    out["label_embs_concat"] = torch.randn(504, 256)
    out["mask_emb"] = torch.randn(768)
    return out


def test_contentvec_fairseq_checkpoint_layout(ref_hubert_module, tmp_path):
    """Build checkpoint_best_legacy_500.pt exactly as fairseq writes it —
    {'args': Namespace, 'model': <fairseq-named sd>, 'optimizer_history',
    'extra_state'} — and check contentvec.load + the layer-9/final_proj tap
    against the reference trunk with the same weights."""
    import jax.numpy as jnp

    from diffsvc_tpu.models import contentvec as jcv

    torch.manual_seed(3)
    ref = ref_hubert_module().eval()
    fsd = _bshall_to_fairseq(ref.state_dict())
    ckpt = {
        "args": Namespace(arch="hubert", encoder_layers=12,
                          encoder_embed_dim=768),
        "model": fsd,
        "optimizer_history": [],
        "extra_state": {"train_iterator": {"epoch": 1}},
    }
    path = tmp_path / "checkpoint_best_legacy_500.pt"
    torch.save(ckpt, str(path))

    params = jcv.load(str(path))
    cfg = jcv.hubert_model.HubertConfig()

    rng = np.random.RandomState(4)
    wav = (rng.randn(16000) * 0.1).astype(np.float32)
    # vec path: NO (400-320)/2 pad; features from layer 9, then final_proj
    # (reference network/hubert/vec_model.py:32-45)
    with torch.no_grad():
        feats, _ = ref.encode(torch.from_numpy(wav)[None, None], layer=9)
        units_t = ref.proj(feats).numpy()[0]
    units_j = np.asarray(jcv.units(params, cfg, jnp.asarray(wav)[None]))[0]
    assert units_j.shape == units_t.shape
    np.testing.assert_allclose(units_j, units_t, atol=5e-4, rtol=1e-3)
