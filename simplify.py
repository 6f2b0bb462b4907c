"""Strip optimizer state from a checkpoint for distribution
(reference simplify.py). Works on framework checkpoints; use
``diffsvc_tpu.utils.convert_torch`` for reference torch ckpts.

    python simplify.py --proj myproj --steps 100000
"""

from argparse import ArgumentParser

from diffsvc_tpu.training.checkpoint import simplify_checkpoint


def main():
    parser = ArgumentParser()
    parser.add_argument("--proj", type=str, required=True)
    parser.add_argument("--steps", type=str, required=True)
    args = parser.parse_args()
    model_name = f"model_ckpt_steps_{args.steps}.ckpt"
    simplify_checkpoint(f"./checkpoints/{args.proj}/{model_name}",
                        f"./clean_{model_name}")
    print(f"| wrote ./clean_{model_name}")


if __name__ == "__main__":
    main()
