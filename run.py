"""Training entry point (reference run.py):

    python run.py --config configs/config_24k.yaml --exp_name myexp --reset
"""

from diffsvc_tpu.config.hparams import hparams, set_hparams


def run_task():
    from diffsvc_tpu.parallel.mesh import maybe_initialize_distributed
    from diffsvc_tpu.training.trainer import Trainer

    # multi-host: every host runs this same program; opt in with
    # `distributed: true` or the JAX_COORDINATOR_ADDRESS env
    maybe_initialize_distributed(hparams)
    assert hparams.get("task_cls", ""), "config must define task_cls"
    if "vocoder" in str(hparams["task_cls"]).lower():
        # vocoder adversarial fine-tuning has its own driver (crop batches
        # of raw waveforms, G/D steps) — not the diffusion Trainer
        from diffsvc_tpu.training.vocoder_task import train_vocoder

        train_vocoder(hparams)
        return
    trainer = Trainer(hparams)
    if hparams.get("infer"):
        # --infer: run the test split through full sampling and save
        # wav/plot/npy artifacts (reference trainer.test path)
        from diffsvc_tpu.training import checkpoint as ckpt_lib
        from diffsvc_tpu.training.test_runner import run_test
        from diffsvc_tpu.vocoders.base import get_vocoder_cls

        state = trainer.task.init_state()
        restored = ckpt_lib.restore_checkpoint(hparams["work_dir"])
        step = 0
        if restored is not None:
            st, _, step, _ = restored
            state = trainer.task.load_params_into_state(state, st["params"])
            if "ema_params" in st and "ema_params" in state:
                # sample with the TRAINED EMA weights, not a reset copy
                import jax

                state["ema_params"] = jax.tree.map(lambda a: a,
                                                   st["ema_params"])
        vocoder = None
        try:
            vocoder = get_vocoder_cls(hparams)(hparams)
        except Exception as e:
            print(f"| vocoder unavailable ({e}); saving mels only")
        run_test(hparams, trainer.task, state, vocoder, global_step=step)
    elif hparams.get("validate"):
        # --validate: one validation pass on the latest checkpoint
        from diffsvc_tpu.data.dataset import FastSpeechDataset
        from diffsvc_tpu.training import checkpoint as ckpt_lib

        state = trainer.task.init_state()
        restored = ckpt_lib.restore_checkpoint(hparams["work_dir"])
        if restored is not None:
            st, _, trainer.global_step, _ = restored
            state = trainer.task.load_params_into_state(state, st["params"])
            if "ema_params" in st and "ema_params" in state:
                import jax

                state["ema_params"] = jax.tree.map(lambda a: a,
                                                   st["ema_params"])
        valid_ds = FastSpeechDataset("valid", hparams, shuffle=False)
        trainer.validate(state, valid_ds,
                         int(hparams.get("frames_multiple", 128)))
    else:
        trainer.fit()


if __name__ == "__main__":
    set_hparams(print_hparams=False)
    run_task()
