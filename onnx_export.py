"""Deployment export CLI (reference onnx_export.py surface).

Exports the converted diffusion model as per-stage StableHLO artifacts
(encoder / denoiser / sampler / vocoder) — the XLA-runtime-portable
equivalent of the reference's split ONNX graphs:

    python onnx_export.py --project myproj --out exported/myproj
"""

import argparse

from diffsvc_tpu.config.hparams import set_hparams
from diffsvc_tpu.infer.export import SvcExporter
from diffsvc_tpu.utils import convert_torch as cvt

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--project", required=True)
    ap.add_argument("--model", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--t_mel", type=int, default=1024)
    ap.add_argument("--t_ph", type=int, default=512)
    ap.add_argument("--acc", type=int, default=10)
    args = ap.parse_args()

    model_path = args.model or f"./checkpoints/{args.project}/"
    config_path = args.config or f"./checkpoints/{args.project}/config.yaml"
    out_dir = args.out or f"./exported/{args.project}"

    hp = set_hparams(config=config_path, exp_name=args.project, infer=True,
                     reset=True, print_hparams=False)
    params = cvt.convert_gaussian_diffusion(model_path, hp)
    paths = SvcExporter(hp, params).export(out_dir, t_mel=args.t_mel,
                                           t_ph=args.t_ph, speedup=args.acc)
    for k, v in paths.items():
        print(f"| exported {k}: {v}")
