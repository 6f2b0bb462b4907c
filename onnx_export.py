"""Deployment export CLI (reference onnx_export.py surface).

Two artifact families:

- ``--format onnx`` (default): the community's split ONNX graphs
  (``{proj}_encoder.onnx`` / ``_denoise`` / ``_pred`` / ``_after``) with
  the same graph interfaces as the reference's torch export (reference
  ``onnx_export.py`` + ``modules/diff/diffusion_V2.py:252-352``),
  emitted by the in-repo jaxpr->ONNX converter (diffsvc_tpu/onnx).
- ``--format stablehlo``: per-stage StableHLO artifacts (encoder /
  denoiser / sampler / vocoder) — the XLA-runtime-portable equivalent,
  consumable via tools/run_exported.py on any PJRT backend.

    python onnx_export.py --project myproj                 # ONNX
    python onnx_export.py --project myproj --format stablehlo

Artifacts are validated in-repo by tests/test_onnx_export.py against the
JAX models (numpy ONNX interpreter; onnxruntime is not available here).
"""

import argparse

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--project", required=True)
    ap.add_argument("--model", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--format", choices=("onnx", "stablehlo"), default="onnx")
    ap.add_argument("--vocoder", action="store_true",
                    help="also export {proj}_hifigan.onnx from hp['vocoder_ckpt'] "
                         "(the reference leaves the vocoder to separately "
                         "published artifacts; we can emit it in-repo)")
    ap.add_argument("--t_mel", type=int, default=1024,
                    help="trace length (stablehlo: fixed; onnx: dynamic-axis trace point)")
    ap.add_argument("--t_ph", type=int, default=512)
    ap.add_argument("--acc", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.format == "onnx":
        jax.config.update("jax_platforms", "cpu")  # export needs no accelerator

    from diffsvc_tpu.config.hparams import set_hparams
    from diffsvc_tpu.utils import convert_torch as cvt

    model_path = args.model or f"./checkpoints/{args.project}/"
    config_path = args.config or f"./checkpoints/{args.project}/config.yaml"
    out_dir = args.out or f"./exported/{args.project}"

    hp = set_hparams(config=config_path, exp_name=args.project, infer=True,
                     reset=True, print_hparams=False)
    params = cvt.convert_gaussian_diffusion(model_path, hp)
    if args.format == "onnx":
        from diffsvc_tpu.onnx.svc_export import export_svc_onnx, export_vocoder_onnx

        paths = export_svc_onnx(hp, params, out_dir, args.project)
        # fast serving profile: when the config selects the dpmpp sampler
        # (configs/config_44k_fast.yaml), also emit the solver-step graph +
        # ladder metadata so the deployed artifact set covers the profile
        if str(hp.get("sampler", "")).lower() in ("dpmpp", "dpm++",
                                                  "dpm_solver"):
            from diffsvc_tpu.onnx.svc_export import export_dpmpp_onnx

            paths.update(export_dpmpp_onnx(
                hp, out_dir, args.project,
                speedup=int(hp.get("pndm_speedup", args.acc))))
        if args.vocoder:
            if "istft" in str(hp.get("vocoder", "")).lower():
                from diffsvc_tpu.onnx.svc_export import export_istft_onnx
                from diffsvc_tpu.vocoders import istft_head as ih

                icfg = ih.IstftVocoderConfig.from_hparams(hp)
                iparams = ih.load_params(str(hp["vocoder_ckpt"]), icfg)
                paths["istft"] = export_istft_onnx(
                    icfg, iparams, out_dir, args.project, t_mel=args.t_mel)
            else:
                from diffsvc_tpu.vocoders.nsf_hifigan import load_model

                vparams, vcfg, _ = load_model(str(hp["vocoder_ckpt"]))
                paths["hifigan"] = export_vocoder_onnx(vcfg, vparams, out_dir,
                                                       args.project)
    else:
        from diffsvc_tpu.infer.export import SvcExporter

        paths = SvcExporter(hp, params).export(out_dir, t_mel=args.t_mel,
                                               t_ph=args.t_ph, speedup=args.acc)
    for k, v in paths.items():
        print(f"| exported {k}: {v}")
