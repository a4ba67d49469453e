"""Optimizer factory (reference ``viscy_utils/optimizers.py:10``):
AdamW with WarmupCosine or Constant schedule, rebuilt on optax."""

from __future__ import annotations

from typing import Literal

import optax


def configure_adamw_scheduler(
    lr: float = 2e-4,
    schedule: Literal["WarmupCosine", "Constant"] = "Constant",
    total_steps: int = 10_000,
    warmup_steps: int | None = None,
    warmup_multiplier: float = 1e-3,
    weight_decay: float = 1e-2,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: float | None = None,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Build AdamW + LR schedule. Returns (tx, schedule_fn)."""
    if schedule == "WarmupCosine":
        if warmup_steps is None:
            warmup_steps = max(1, total_steps // 100)
        total_steps = max(total_steps, warmup_steps + 1)
        sched = optax.warmup_cosine_decay_schedule(
            init_value=lr * warmup_multiplier,
            peak_value=lr,
            warmup_steps=warmup_steps,
            decay_steps=total_steps,
            end_value=0.0,
        )
    elif schedule == "Constant":
        sched = optax.constant_schedule(lr)
    else:
        raise ValueError(f"Unknown schedule {schedule!r}")
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(sched, b1=b1, b2=b2, weight_decay=weight_decay))
    return optax.chain(*chain), sched
