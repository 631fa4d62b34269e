"""Analytic reprojection residual and jacobian wrt a right pose perturbation.

The perturbation convention matches reference lib/nll/pnp_auto.py:13-56:
    R' = R · R(δ_rot),   t' = t + δ_t
so the jacobian is evaluated in the local tangent frame at the current pose — the
natural chart for Gauss-Newton / LM updates and for the implicit-function-theorem
covariance. Everything is closed-form jnp (the reference re-derives this jacobian with
autodiff for its Hessian trick; we never need autodiff here — see covariance.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geom.rotations import quaternion_to_matrix, skew_symmetric
from ..ops.smallmat import rot_pts, mm_small


def residual_with_jac6d(pose7: jax.Array, cam_K: jax.Array, pts3d: jax.Array,
                        pts2d: jax.Array, min_z: float = 1e-6
                        ) -> tuple[jax.Array, jax.Array]:
    """Residual r = proj(pose, X) − x and jacobian ∂r/∂δ at δ = 0.

    pose7: (..., 7) wijk_xyz; cam_K: (..., 3, 3); pts3d: (..., N, 3); pts2d: (..., N, 2).
    Returns r (..., N, 2), J (..., N, 2, 6) with columns [δ_rot(3), δ_t(3)].

    Derivation: camera point p = R(R(δ)X) + t + δt; at δ=0,
    ∂p/∂δ_rot = R·(−skew(X)) = R·skew(X)ᵀ, ∂p/∂δ_t = I. Projection u0 = p_xy/p_z has
    ∂u0/∂p = (1/z)[I₂ | −u0]; pixel uv = K₂ₓ₂·u0 + c.

    All tiny contractions are VPU elementwise (see ops/smallmat.py) — this is the
    innermost op of the LM solver and the LC covariance.
    """
    R = quaternion_to_matrix(pose7[..., :4])          # (..., 3, 3)
    t = pose7[..., 4:7]
    p = rot_pts(pts3d, R) + t[..., None, :]           # (..., N, 3)

    inv_z = 1.0 / jnp.maximum(p[..., 2], min_z)       # (..., N)
    u0 = p[..., :2] * inv_z[..., None]                # (..., N, 2)

    K22 = cam_K[..., :2, :2]                          # (..., 2, 2)
    uv = rot_pts(u0, K22) + cam_K[..., None, :2, 2]
    r = uv - pts2d

    # ∂u0/∂p = inv_z * [I2 | -u0]  -> (..., N, 2, 3)
    eye2 = jnp.broadcast_to(jnp.eye(2, dtype=u0.dtype), u0.shape[:-1] + (2, 2))
    du0_dp = inv_z[..., None, None] * jnp.concatenate(
        (eye2, -u0[..., :, None]), axis=-1)

    # ∂p/∂δ_rot = R @ skew(X)ᵀ  -> (..., N, 3, 3)
    dp_drot = mm_small(R[..., None, :, :],
                       jnp.swapaxes(skew_symmetric(pts3d), -1, -2))

    duv_dp = mm_small(K22[..., None, :, :], du0_dp)   # (..., N, 2, 3)
    J = jnp.concatenate((mm_small(duv_dp, dp_drot), duv_dp), axis=-1)
    return r, J


def reproj_cost(pose7: jax.Array, cam_K: jax.Array, pts3d: jax.Array,
                pts2d: jax.Array, w: jax.Array | None = None,
                valid: jax.Array | None = None) -> jax.Array:
    """0.5 Σ w·r² weighted reprojection cost. w: (..., N, 2) or None; valid: (..., N)."""
    r, _ = residual_with_jac6d(pose7, cam_K, pts3d, pts2d)
    sq = r * r
    if w is not None:
        sq = sq * w
    if valid is not None:
        sq = sq * valid[..., None]
    return 0.5 * jnp.sum(sq, axis=(-1, -2))
