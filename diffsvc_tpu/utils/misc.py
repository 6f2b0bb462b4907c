"""Shared small utilities (reference utils/__init__.py:28-250): loss meters,
timers with named profiler spans, parameter counting, checkpoint globbing.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict, Optional


class AvgrageMeter:
    """(sic — reference name kept) running average of a scalar."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.avg = 0.0
        self.sum = 0.0
        self.cnt = 0

    def update(self, val, n: int = 1):
        self.sum += val * n
        self.cnt += n
        self.avg = self.sum / self.cnt


class Timer:
    """Context-manager timer with a global accumulation map and optional
    jax.profiler trace annotation (the reference's utils.Timer + the
    'named spans' tracing upgrade, SURVEY.md §5.1)."""

    timer_map: Dict[str, float] = defaultdict(float)

    def __init__(self, name: str, print_time: bool = False, trace: bool = True):
        self.name = name
        self.print_time = print_time
        self.trace = trace
        self._span = None

    def __enter__(self):
        if self.trace:
            try:
                import jax.profiler

                self._span = jax.profiler.TraceAnnotation(self.name)
                self._span.__enter__()
            except Exception:
                self._span = None
        self.t = time.time()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        dt = time.time() - self.t
        Timer.timer_map[self.name] += dt
        if self._span is not None:
            self._span.__exit__(exc_type, exc_val, exc_tb)
        if self.print_time:
            print(self.name, Timer.timer_map[self.name])


def timeit(func):
    """Wall-time print decorator (reference infer_tool.py:60-67)."""

    def run(*args, **kwargs):
        t = time.time()
        res = func(*args, **kwargs)
        print(f"executing '{func.__name__}' costed {time.time() - t:.3f}s")
        return res

    return run


def num_params(params, print_out: bool = True, model_name: str = "model") -> float:
    """Parameter count in millions over a pytree."""
    import jax
    import numpy as np

    n = sum(np.prod(x.shape) for x in jax.tree.leaves(params)
            if hasattr(x, "shape"))
    m = n / 1_000_000
    if print_out:
        print(f"| {model_name} Trainable Parameters: {m:.3f}M")
    return m


def get_last_checkpoint(work_dir: str) -> Optional[str]:
    """Alias for training.checkpoint.latest_checkpoint (single source of
    truth for the model_ckpt_steps_*.ckpt naming/rotation scheme)."""
    from ..training.checkpoint import latest_checkpoint

    return latest_checkpoint(work_dir)


def start_profiler_server(port: int = 9999):
    """Expose the jax profiler for tensorboard capture."""
    import jax.profiler

    jax.profiler.start_server(port)
    print(f"| jax profiler server on :{port}")
