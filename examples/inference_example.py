"""End-to-end example (the reference ships this as inference.ipynb):
load a model, convert raw/test_input.wav, plot input/pe/generated f0 curves.

    python examples/inference_example.py --project myvoice
"""

import argparse
import os

import numpy as np

from diffsvc_tpu.infer.svc import Svc
from diffsvc_tpu.utils.audio_io import save_wav

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--project", required=True)
    ap.add_argument("--model", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--wav", default="raw/test_input.wav")
    ap.add_argument("--key", type=int, default=0)
    ap.add_argument("--acc", type=int, default=20)
    args = ap.parse_args()

    model_path = args.model or f"./checkpoints/{args.project}/"
    config_path = args.config or f"./checkpoints/{args.project}/config.yaml"

    model = Svc(args.project, config_path, True, model_path)
    f0_gt, f0_pred, wav_pred = model.infer(
        args.wav, key=args.key, acc=args.acc,
        use_pe=model.hp["audio_sample_rate"] == 24000, use_crepe=False)

    out = f"results/{os.path.splitext(os.path.basename(args.wav))[0]}_example.wav"
    os.makedirs("results", exist_ok=True)
    save_wav(np.asarray(wav_pred), out, model.hp["audio_sample_rate"])
    print(f"| wrote {out}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(12, 4))
        plt.plot(f0_gt, label="input f0", alpha=0.7)
        plt.plot(f0_pred, label="pred f0", alpha=0.7)
        plt.legend()
        plt.savefig(out.replace(".wav", "_f0.png"))
        print(f"| wrote {out.replace('.wav', '_f0.png')}")
    except Exception as e:
        print(f"| plot skipped: {e}")
