"""Ranger optimizer (RAdam + Lookahead + gradient centralization) as one optax
GradientTransformation.

Semantics match reference lib/optim/ranger.py:29-200:
  * gradient centralization on tensors with ndim > 1 (conv + fc);
  * RAdam with betas (0.95, 0.999), eps 1e-5, N_sma threshold 5 (SGD-with-momentum
    fallback while the variance estimate is unrectifiable);
  * decoupled weight decay p ← p − wd·lr·p applied at step time;
  * integrated lookahead: every k=6 steps, p ← slow + α(p − slow) with α=0.5.

One fused transformation instead of an optax chain so the lookahead slow weights and
the RAdam moments live in a single state pytree (simpler checkpointing, one pass).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def _first_rectified_step(b2: float, threshold: float) -> int:
    """First step where RAdam's N_sma exceeds the threshold, in exact f64.

    N_sma(t) crosses the threshold once (monotone for b2 < 1); the reference
    evaluates the comparison in Python f64 (lib/optim/ranger.py:160-164). An
    on-device f32 comparison is off by ±0.03 near the boundary — enough to flip
    the rectification step and change that step's update scale ~1000× — so we
    resolve the boundary statically and gate on the integer step instead.
    """
    n_max = 2.0 / (1.0 - b2) - 1.0
    for t in range(1, 10_000_000):
        b2t = b2 ** t
        if n_max - 2.0 * t * b2t / (1.0 - b2t) > threshold:
            return t
    raise ValueError(f"N_sma never exceeds {threshold} for b2={b2}")


class RangerState(NamedTuple):
    step: jax.Array
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    slow: optax.Params


def ranger(learning_rate, *, alpha: float = 0.5, k: int = 6,
           n_sma_threshold: float = 5.0, b1: float = 0.95, b2: float = 0.999,
           eps: float = 1e-5, weight_decay: float = 0.0,
           gc_conv_only: bool = False) -> optax.GradientTransformation:
    gc_dim_threshold = 3 if gc_conv_only else 1
    rect_step = _first_rectified_step(b2, n_sma_threshold)
    log_b2 = math.log(b2)

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return RangerState(step=jnp.zeros((), jnp.int32), exp_avg=zeros,
                           exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
                           slow=jax.tree.map(jnp.asarray, params))

    def update(updates, state: RangerState, params=None):
        assert params is not None, "ranger requires params"
        step = state.step + 1
        lr = learning_rate(step) if callable(learning_rate) else learning_rate

        def centralize(g):
            if g.ndim > gc_dim_threshold:
                axes = tuple(range(1, g.ndim))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        grads = jax.tree.map(centralize, updates)
        exp_avg = jax.tree.map(lambda m, g: m * b1 + g * (1 - b1),
                               state.exp_avg, grads)
        exp_avg_sq = jax.tree.map(lambda v, g: v * b2 + g * g * (1 - b2),
                                  state.exp_avg_sq, grads)

        stepf = step.astype(jnp.float32)
        # 1 − b2^t via expm1: relative (not absolute-in-b2t) f32 accuracy, which
        # N_sma needs — its sensitivity to b2^t is ~2t/(1−b2^t)², huge near t=0
        one_minus_b2t = -jnp.expm1(stepf * log_b2)
        beta2_t = 1.0 - one_minus_b2t
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * stepf * beta2_t / one_minus_b2t
        rect = jnp.sqrt(one_minus_b2t * (n_sma - 4.0) / (n_sma_max - 4.0)
                        * (n_sma - 2.0) / n_sma * n_sma_max / (n_sma_max - 2.0))
        bias1 = -jnp.expm1(stepf * math.log(b1))
        rectified = step >= rect_step
        step_size = jnp.where(rectified, rect / bias1, 1.0 / bias1)

        def delta(m, v, p):
            adam = m / (jnp.sqrt(v) + eps)
            upd = jnp.where(rectified, adam, m)
            d = -step_size * lr * upd
            if weight_decay != 0.0:
                d = d - weight_decay * lr * p
            return d

        deltas = jax.tree.map(delta, exp_avg, exp_avg_sq, params)

        # integrated lookahead: on sync steps, land on slow + α(fast_new − slow)
        sync = (step % k) == 0

        def look(d, p, s):
            fast_new = p + d
            target = s + alpha * (fast_new - s)
            return jnp.where(sync, target - p, d)

        def new_slow(d, p, s):
            fast_new = p + d
            return jnp.where(sync, s + alpha * (fast_new - s), s)

        final = jax.tree.map(look, deltas, params, state.slow)
        slow = jax.tree.map(new_slow, deltas, params, state.slow)
        return final, RangerState(step=step, exp_avg=exp_avg,
                                  exp_avg_sq=exp_avg_sq, slow=slow)

    return optax.GradientTransformation(init, update)
