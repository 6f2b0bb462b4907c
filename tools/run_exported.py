"""Standalone consumer for exported StableHLO artifacts (doc/export.md).

Demonstrates that a deployment needs ONLY `jax.export` deserialization —
none of the diffsvc_tpu model code — to run the full conversion chain
(encoder -> PLMS sampler -> vocoder), i.e. the consumption counterpart of
the reference's split ONNX graphs (reference onnx_export.py:12-17,
modules/diff/diffusion_V2.py:183-352).

    python tools/run_exported.py --export_dir exported/myproj \
        --features feats.npz --out out_dir

feats.npz keys (shapes from export_meta.json; pad/truncate to t_ph/t_mel):
    hubert [B, t_ph, hidden]   content units
    mel2ph [B, t_mel] int32    1-based alignment (0 = padding)
    f0     [B, t_mel]          normalized log2 f0
    uv     [B, t_mel]          unvoiced mask (float)
    energy [B, t_mel]          (zeros if unused)
    noise  [B, t_mel, mel]     optional x_T; random when absent

Writes mel.npy [B, t_mel, mel] (+ wav.npy when vocoder.stablehlo exists).
"""

import argparse
import json
import os

import numpy as np


def load_stage(path):
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read()).call


def run_fused(args):
    """--fused: consume a single-dispatch fused artifact — raw wav in,
    converted wav out; no model code, no feature extraction needed (it is
    all inside the exported program)."""
    with open(os.path.join(args.export_dir, "fused_meta.json")) as f:
        meta = json.load(f)
    wav = np.load(args.features)
    if hasattr(wav, "files"):
        wav = wav["wav"]
    wav = np.asarray(wav, np.float32).ravel()
    buckets = sorted(int(k) for k in meta)
    n44 = next((b for b in buckets if b >= len(wav)), buckets[-1])
    if len(wav) > n44:
        print(f"| WARNING: input has {len(wav)} samples but the largest "
              f"exported bucket is {n44} — converting only the first "
              f"{n44} samples (export more buckets to cover longer audio)")
    wav_in = np.zeros((n44,), np.float32)
    wav_in[: min(len(wav), n44)] = wav[:n44]
    fused = load_stage(os.path.join(args.export_dir,
                                    f"fused_{n44}.stablehlo"))
    key = np.zeros((2,), np.uint32)
    key[1] = args.seed
    wav_o, f0_o, mel_o = fused(wav_in, key, np.float32(args.key),
                               np.int32(0))
    os.makedirs(args.out, exist_ok=True)
    for name, arr in [("wav", wav_o), ("f0", f0_o), ("mel", mel_o)]:
        np.save(os.path.join(args.out, f"{name}.npy"), np.asarray(arr))
    sr = meta[str(n44)]["sample_rate"]
    print(f"| fused bucket {n44}: wav {np.asarray(wav_o).shape} ({sr} Hz) "
          f"-> {args.out}/")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--export_dir", required=True)
    ap.add_argument("--features", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fused", action="store_true",
                    help="consume a fused_{n}.stablehlo artifact: "
                         "--features is a raw wav .npy/.npz")
    ap.add_argument("--key", type=float, default=0.0,
                    help="semitone shift (fused mode)")
    args = ap.parse_args()

    if args.fused:
        run_fused(args)
        return

    with open(os.path.join(args.export_dir, "export_meta.json")) as f:
        meta = json.load(f)
    feats = np.load(args.features)
    b, t_mel, t_ph = meta["batch"], meta["t_mel"], meta["t_ph"]

    hubert = np.asarray(feats["hubert"], np.float32)
    assert hubert.shape == (b, t_ph, meta["hidden"]), hubert.shape
    mel2ph = np.asarray(feats["mel2ph"], np.int32)
    f0 = np.asarray(feats["f0"], np.float32)
    uv = np.asarray(feats["uv"], np.float32)
    energy = np.asarray(feats["energy"], np.float32)

    encoder = load_stage(os.path.join(args.export_dir, "encoder.stablehlo"))
    sampler = load_stage(os.path.join(args.export_dir, "sampler.stablehlo"))

    cond, f0_denorm = encoder(hubert, mel2ph, f0, uv, energy)
    if "noise" in feats:
        noise = np.asarray(feats["noise"], np.float32)
    else:
        noise = np.random.RandomState(args.seed).randn(
            b, t_mel, meta["mel_bins"]).astype(np.float32)
    mel = np.asarray(sampler(cond, noise))
    mel = mel * (mel2ph > 0)[:, :, None]

    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "mel.npy"), mel)
    print(f"| mel: {mel.shape} -> {args.out}/mel.npy")

    voc_path = os.path.join(args.export_dir, "vocoder.stablehlo")
    if os.path.exists(voc_path):
        vocoder = load_stage(voc_path)
        wav = np.asarray(vocoder(mel, np.asarray(f0_denorm)))
        np.save(os.path.join(args.out, "wav.npy"), wav)
        print(f"| wav: {wav.shape} ({meta['sample_rate']} Hz) "
              f"-> {args.out}/wav.npy")


if __name__ == "__main__":
    main()
