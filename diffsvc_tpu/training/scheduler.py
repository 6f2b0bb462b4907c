"""LR schedules matching the reference trainer semantics.

- RSQRT with warmup (reference utils/__init__.py RSQRTSchedule as used by
  TtsTask): lr * hidden_size**-0.5 * min(step*warmup**-1.5, step**-0.5)
  stepped on every optimizer step, constant below warmup in the reference's
  formulation.
- StepLR halving every ``decay_steps`` (SVCTask: torch StepLR(gamma=0.5),
  stepped on global_step // accumulate_grad_batches, SVC_task.py:116-125).
"""

from __future__ import annotations


def rsqrt_schedule(lr: float, warmup_updates: int, hidden_size: int):
    """lr * min(step/warmup, 1) * max(warmup, step)^-0.5 * hidden^-0.5,
    floored at 1e-7 (reference utils/training_utils.py:16-23)."""

    def schedule(step):
        import jax.numpy as jnp

        s = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        warmup = jnp.minimum(s / warmup_updates, 1.0)
        rsqrt_decay = jnp.maximum(float(warmup_updates), s) ** -0.5
        return jnp.maximum(lr * warmup * rsqrt_decay * hidden_size**-0.5, 1e-7)

    return schedule


def step_lr_schedule(lr: float, decay_steps: int, gamma: float = 0.5):
    """StepLR halving every ``decay_steps`` OPTIMIZER steps.

    The schedule is evaluated by optax.adamw, whose count (inside
    optax.MultiSteps) already advances once per accumulate_grad_batches
    micro-steps — i.e. it IS the reference's global_step // accumulate
    (SVC_task.py:125). Dividing here again would decay accumulate^2 times
    too late."""

    def schedule(step):
        return lr * gamma ** (step // decay_steps)

    return schedule


def build_lr_schedule(hp):
    sched = hp.get("scheduler", "step_lr")
    if sched == "rsqrt":
        return rsqrt_schedule(hp["lr"], hp.get("warmup_updates", 2000),
                              hp["hidden_size"])
    return step_lr_schedule(hp["lr"], hp.get("decay_steps", 40000), 0.5)
