"""Checkpointing: step-named files, atomic writes, keep-K rotation, best
tracking, auto-resume — the reference trainer's semantics (SURVEY.md §5.4;
``utils/pl_utils.py:284-356,605-781``) on numpy pytrees.

On-disk: ``model_ckpt_steps_<global_step>.ckpt`` pickles
``{epoch, global_step, checkpoint_callback_best, state['params'...]}`` with
all leaves as numpy. ``.part``-suffixed temp files + os.replace guarantee no
torn checkpoints; ``best_valid.npy`` persists the best monitor value.
"""

from __future__ import annotations

import glob
import os
import pickle
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(work_dir: str, state: Dict[str, Any], epoch: int,
                    global_step: int, best: Optional[float] = None,
                    num_ckpt_keep: int = 10, save_best: bool = False,
                    monitor_value: Optional[float] = None,
                    monitor_mode: str = "min") -> str:
    os.makedirs(work_dir, exist_ok=True)
    ckpt = {
        "epoch": epoch,
        "global_step": global_step,
        "checkpoint_callback_best": best,
        "state": _to_numpy_tree(state),
    }
    path = os.path.join(work_dir, f"model_ckpt_steps_{global_step}.ckpt")
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        pickle.dump(ckpt, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)

    # rotation: keep the newest K
    for old in sorted(_list_ckpts(work_dir), key=_ckpt_step)[:-num_ckpt_keep]:
        os.remove(old)
        print(f"Delete ckpt: {os.path.basename(old)}")

    if save_best and monitor_value is not None:
        best_fn = os.path.join(work_dir, "best_valid.npy")
        prev = np.load(best_fn)[0] if os.path.exists(best_fn) else (
            np.inf if monitor_mode == "min" else -np.inf)
        improved = (monitor_value < prev) if monitor_mode == "min" else (monitor_value > prev)
        if improved:
            np.save(best_fn, [monitor_value])
            best_path = os.path.join(work_dir, "model_ckpt_best.pt")
            with open(best_path + ".part", "wb") as f:
                pickle.dump(ckpt, f, protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(best_path + ".part", best_path)
    return path


def _list_ckpts(work_dir: str):
    return [p for p in glob.glob(os.path.join(work_dir, "model_ckpt_steps_*.ckpt"))
            if not p.endswith(".part")]


def _ckpt_step(path: str) -> int:
    m = re.findall(r"model_ckpt_steps_(\d+)\.ckpt", path)
    return int(m[0]) if m else -1


def latest_checkpoint(work_dir: str) -> Optional[str]:
    ckpts = _list_ckpts(work_dir)
    return max(ckpts, key=_ckpt_step) if ckpts else None


def restore_checkpoint(work_dir: str) -> Optional[Tuple[Dict, int, int, Optional[float]]]:
    """Auto-resume from the highest-step checkpoint. Returns
    (state, epoch, global_step, best) or None."""
    path = latest_checkpoint(work_dir)
    if path is None:
        return None
    with open(path, "rb") as f:
        ckpt = pickle.load(f)
    print(f"| Restored checkpoint {os.path.basename(path)} "
          f"(step {ckpt['global_step']})")
    return (ckpt["state"], ckpt["epoch"], ckpt["global_step"],
            ckpt.get("checkpoint_callback_best"))


def load_params_for_infer(ckpt_path: str) -> Dict:
    """Load just the model params from a framework checkpoint (path or dir)."""
    if os.path.isdir(ckpt_path):
        ckpt_path = latest_checkpoint(ckpt_path)
    with open(ckpt_path, "rb") as f:
        ckpt = pickle.load(f)
    # prefer EMA weights for inference when present
    return ckpt["state"].get("ema_params") or ckpt["state"]["params"]


def simplify_checkpoint(in_path: str, out_path: str) -> None:
    """Strip optimizer state for distribution (reference simplify.py)."""
    with open(in_path, "rb") as f:
        ckpt = pickle.load(f)
    slim = {"epoch": ckpt["epoch"], "global_step": ckpt["global_step"],
            "state": {"params": ckpt["state"]["params"]}}
    with open(out_path + ".part", "wb") as f:
        pickle.dump(slim, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(out_path + ".part", out_path)
