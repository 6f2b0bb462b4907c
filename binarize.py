"""Offline binarization CLI (reference preprocessing/binarize.py):

    python binarize.py --config configs/config_24k.yaml
"""

import os

os.environ.setdefault("OMP_NUM_THREADS", "1")

from diffsvc_tpu.config.hparams import hparams, set_hparams
from diffsvc_tpu.data.binarizer import binarize

if __name__ == "__main__":
    set_hparams(print_hparams=False)
    binarize(hparams)
