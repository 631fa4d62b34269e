"""Pinhole projection and backprojection, pure jnp.

Semantics match reference lib/transforms/transforms.py:47-74 (project_apply, gen_uv)
and losses.py:187-193 (xyz_from_homo_z).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def project_apply(cam_K: jax.Array, pts3d: jax.Array,
                  R: jax.Array | None = None, t: jax.Array | None = None,
                  min_z: float = 0.1) -> jax.Array:
    """Project 3D points with optional rigid transform.

    cam_K: (..., 3, 3); pts3d: (..., N, 3); R: (..., 3, 3); t: (..., 3).
    Returns (..., N, 2). z is clamped to min_z before division (same guard as the
    reference, keeps gradients finite for points behind the camera).
    """
    if R is not None:
        pts3d = pts3d @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    h = pts3d @ jnp.swapaxes(cam_K, -1, -2)
    z = jnp.maximum(h[..., 2:3], min_z)
    return h[..., :2] / z


def gen_uv(shape_hw, dtype=jnp.float32) -> jax.Array:
    """Pixel-center grid: (H, W, 2) with uv[y, x] = (x, y)."""
    H, W = shape_hw[-2:]
    x = jax.lax.broadcasted_iota(dtype, (H, W), 1)
    y = jax.lax.broadcasted_iota(dtype, (H, W), 0)
    return jnp.stack((x, y), axis=-1)


def xyz_from_homo_z(homo_z: jax.Array, R: jax.Array, t: jax.Array,
                    cam_K: jax.Array) -> jax.Array:
    """Backproject depth-scaled homogeneous pixels into the model frame.

    homo_z: (..., P, 3) rows of (u·z, v·z, z) in camera pixels;
    R, t: model-to-camera pose; cam_K: (..., 3, 3).
    Returns model-frame points (..., P, 3): Rᵀ (K⁻¹ h − t).
    """
    inv_K = jnp.linalg.inv(cam_K)
    cam_pts = homo_z @ jnp.swapaxes(inv_K, -1, -2)
    return (cam_pts - t[..., None, :]) @ R
