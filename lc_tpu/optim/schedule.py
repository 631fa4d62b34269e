"""flat-and-anneal LR schedule (optax schedule function).

Semantics match reference lib/optim/lr_scheduler.py:179-265: linear/constant warmup,
flat section, then cosine / linear / poly / exp / step annealing starting at
anneal_point · total_iters. Returns a multiplier schedule; multiply by base_lr at
the optimizer.
"""
from __future__ import annotations

import jax.numpy as jnp


def flat_and_anneal_schedule(*, total_iters: int, base_lr: float = 1.0,
                             warmup_iters: int = 0, warmup_factor: float = 0.1,
                             warmup_method: str = "linear",
                             anneal_point: float = 0.72,
                             anneal_method: str = "cosine",
                             target_lr_factor: float = 0.0,
                             poly_power: float = 1.0, step_gamma: float = 0.1,
                             steps=(2 / 3.0, 8 / 9.0)):
    if warmup_method not in ("constant", "linear"):
        raise ValueError(f"bad warmup_method {warmup_method}")
    if anneal_method not in ("cosine", "linear", "poly", "exp", "step", "none"):
        raise ValueError(f"bad anneal_method {anneal_method}")
    if anneal_method == "step":
        anneal_start = steps[0] * total_iters
        milestones = [s * total_iters for s in steps]
    else:
        if not 0 <= anneal_point <= 1:
            raise ValueError(f"anneal_point must be in [0,1], got {anneal_point}")
        anneal_start = anneal_point * total_iters
        milestones = None

    def schedule(count):
        x = jnp.asarray(count, jnp.float32)
        # warmup factor
        if warmup_iters > 0:
            a = x / warmup_iters
            wf = warmup_factor * (1 - a) + a if warmup_method == "linear" \
                else jnp.full_like(x, warmup_factor)
        else:
            wf = jnp.ones_like(x)

        span = max(total_iters - anneal_start, 1e-8)
        prog = (x - anneal_start) / span
        if anneal_method == "cosine":
            af = target_lr_factor + 0.5 * (1 - target_lr_factor) * (
                1 + jnp.cos(jnp.pi * prog))
        elif anneal_method == "linear":
            af = target_lr_factor + (1 - target_lr_factor) * (1 - prog)
        elif anneal_method == "poly":
            af = target_lr_factor + (1 - target_lr_factor) * \
                jnp.maximum(1 - prog, 0.0) ** poly_power
        elif anneal_method == "exp":
            tgt = max(target_lr_factor, 5e-3)
            af = tgt ** prog
        elif anneal_method == "step":
            af = jnp.ones_like(x)
            for m in milestones:
                af = af * jnp.where(x >= m, step_gamma, 1.0)
        else:
            af = jnp.ones_like(x)

        factor = jnp.where(x < warmup_iters, wf,
                           jnp.where(x >= anneal_start, af, 1.0))
        return base_lr * factor

    return schedule
