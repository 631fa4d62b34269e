"""Seeding / RNG state (reference lib/utils/random_state.py:29 seed_all).

JAX side is already functional (explicit PRNG keys derived from the step), so
"seeding" covers the host: python `random`, numpy's global RNG, and the loader
generators. State capture for checkpointing mirrors the reference's
get/restore_random_state.
"""
from __future__ import annotations

import random

import numpy as np
import jax


def seed_all(seed: int) -> jax.Array:
    """Seed host RNGs; returns the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed % (1 << 32))
    return jax.random.PRNGKey(seed)


def get_random_state() -> dict:
    return {
        'python': random.getstate(),
        'numpy': np.random.get_state(),
    }


def restore_random_state(state: dict) -> None:
    random.setstate(state['python'])
    np.random.set_state(state['numpy'])


def step_key(root: jax.Array, step) -> jax.Array:
    """Deterministic per-step key — resume-safe regardless of history."""
    return jax.random.fold_in(root, step)
