from .hparams import HParams, set_hparams, hparams, load_config_chain

__all__ = ["HParams", "set_hparams", "hparams", "load_config_chain"]
