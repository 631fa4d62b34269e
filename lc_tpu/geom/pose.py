"""The 7-vector pose representation (wijk quaternion + xyz translation).

Semantics match reference lib/transforms/transforms.py:6-44 (quaternion_rep_to_RT /
RT_to_quaternion_rep) and lib/nll/pnp_utils.py:107 (apply_perturb).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotations import (
    quaternion_to_matrix,
    matrix_to_quaternion,
    quaternion_raw_multiply,
    axis_angle_to_quaternion_near_zero,
)


def pose7_to_RT(pose7: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., 7) wijk_xyz -> R (..., 3, 3), t (..., 3)."""
    return quaternion_to_matrix(pose7[..., :4]), pose7[..., 4:7]


def RT_to_pose7(R: jax.Array, t: jax.Array) -> jax.Array:
    """R (..., 3, 3), t (..., 3) -> (..., 7) wijk_xyz."""
    return jnp.concatenate((matrix_to_quaternion(R), t), axis=-1)


def apply_perturb(pose7: jax.Array, d_aax_xyz: jax.Array) -> jax.Array:
    """Right-perturb a pose: R' = R @ R(δ_rot), t' = t + δ_t.

    δ_rot is axis-angle through the Taylor chart (3rd-order differentiable at 0),
    so jacfwd of maps composed with this at δ = 0 is exact.
    """
    q = quaternion_raw_multiply(
        pose7[..., :4], axis_angle_to_quaternion_near_zero(d_aax_xyz[..., :3])
    )
    return jnp.concatenate((q, pose7[..., 4:7] + d_aax_xyz[..., 3:6]), axis=-1)
