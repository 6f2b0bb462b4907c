"""Training entry point (reference run.py):

    python run.py --config configs/config_24k.yaml --exp_name myexp --reset
"""

from diffsvc_tpu.config.hparams import hparams, set_hparams


def run_task():
    from diffsvc_tpu.training.trainer import Trainer

    assert hparams.get("task_cls", ""), "config must define task_cls"
    # the reference resolves task_cls dynamically; the SVC task is the only
    # task family here, trained through the TPU Trainer
    trainer = Trainer(hparams)
    trainer.fit()


if __name__ == "__main__":
    set_hparams(print_hparams=False)
    run_task()
