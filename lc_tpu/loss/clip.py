"""EMA-adaptive activation-gradient clipping, functional.

The reference clips gradients flowing into selected activations (weight logits,
weight scale, 3D points) with per-tensor EMA-tracked max-norms installed as backward
hooks (reference lib/utils/grad.py:5-31, attached at losses.py:341-381).

JAX has no hooks; instead `grad_tap(x, max_norm, norm_tap)` is a custom_vjp identity
whose backward (a) clips the cotangent to max_norm and (b) smuggles the *observed*
pre-clip norm out as the "gradient" of the dummy `norm_tap` argument. The train step
takes grad wrt the taps too and feeds the observed norms into
`update_clipper_state`, reproducing the EMA dynamics without any mutable state.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


@jax.custom_vjp
def grad_tap(x: jax.Array, max_norm: jax.Array, norm_tap: jax.Array) -> jax.Array:
    """Identity on x; backward clips the cotangent to max_norm (L2, global over x)
    and reports the unclipped norm as d/d(norm_tap)."""
    del max_norm, norm_tap
    return x


def _grad_tap_fwd(x, max_norm, norm_tap):
    return x, (max_norm,)


def _grad_tap_bwd(res, g):
    (max_norm,) = res
    total = jnp.linalg.norm(g.reshape(-1))
    coef = jnp.minimum(max_norm / (total + 1e-6), 1.0)
    return g * coef, jnp.zeros_like(max_norm), total


grad_tap.defvjp(_grad_tap_fwd, _grad_tap_bwd)


class ClipperState(NamedTuple):
    max_norm: jax.Array   # scalar; < 0 means "not initialized yet"
    started: jax.Array    # bool scalar


def init_clipper_state(dtype=jnp.float32) -> ClipperState:
    return ClipperState(max_norm=jnp.asarray(-1.0, dtype),
                        started=jnp.asarray(False))


def clip_threshold(state: ClipperState, initial_max_norm: float = 100.0) -> jax.Array:
    """Threshold to clip with this step (first step uses the static initial norm)."""
    return jnp.where(state.max_norm > 0, state.max_norm,
                     jnp.asarray(initial_max_norm, state.max_norm.dtype))


def update_clipper_state(state: ClipperState, observed_norm: jax.Array, *,
                         rel_thresh: float = 0.7, momentum: float = 0.1,
                         initial_max_norm: float = 100.0) -> ClipperState:
    """EMA update mirroring reference NormClipper.clip (lib/utils/grad.py:19-30)."""
    scale = 1.0 + rel_thresh
    first = jnp.logical_and(jnp.logical_not(state.started), state.max_norm <= 0)
    seeded = observed_norm * scale
    cur = clip_threshold(state, initial_max_norm)
    ema = cur * (1.0 - momentum) + momentum * scale * jnp.minimum(
        observed_norm, cur * scale)
    return ClipperState(max_norm=jnp.where(first, seeded, ema),
                        started=jnp.asarray(True))
