"""Rotation representation conversions, pure jnp.

Covers the conversions the LC pipeline needs (reference:
/root/reference/lib/transforms/rotation_conversions.py, pytorch3d-derived), rewritten
TPU-first: branch-free (no data-dependent control flow, everything jit/vmap-safe),
float32 by default, batched over arbitrary leading dims.

Quaternions are (w, i, j, k) ("wijk"), matching the reference's convention.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quaternion_raw_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of quaternions. a, b: (..., 4) wijk -> (..., 4)."""
    aw, ax, ay, az = jnp.split(a, 4, axis=-1)
    bw, bx, by, bz = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        (
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ),
        axis=-1,
    )


def quaternion_invert(q: jax.Array) -> jax.Array:
    """Conjugate of a unit quaternion (..., 4)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def standardize_quaternion(q: jax.Array) -> jax.Array:
    """Flip sign so the real part is non-negative."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) wijk -> rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    s = 2.0 / jnp.sum(q * q, axis=-1)  # == 2 for unit quats; robust otherwise
    xx, yy, zz = s * x * x, s * y * y, s * z * z
    xy, xz, yz = s * x * y, s * x * z, s * y * z
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    m = jnp.stack(
        (
            1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy),
        ),
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wijk.

    Branch-free variant of Shepperd's method: build all four candidate quaternions
    (one per largest diagonal term), then select the numerically best one. Safe under
    jit/vmap and differentiable away from the degenerate set.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Absolute values of the four quaternion components (up to sign), from the trace
    # identities. clip for numerical safety.
    q_abs = jnp.stack(
        (
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ),
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs, 0.0))

    # Candidate quaternions, each valid when the corresponding q_abs entry dominates.
    cand_w = jnp.stack((q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01), axis=-1)
    cand_x = jnp.stack((m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20), axis=-1)
    cand_y = jnp.stack((m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21), axis=-1)
    cand_z = jnp.stack((m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2), axis=-1)
    cands = jnp.stack((cand_w, cand_x, cand_y, cand_z), axis=-2)  # (..., 4 cand, 4)

    denom = 2.0 * jnp.maximum(q_abs, 0.1 * jnp.finfo(m.dtype).eps)
    cands = cands / denom[..., None]

    best = jnp.argmax(q_abs, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    return standardize_quaternion(q / jnp.linalg.norm(q, axis=-1, keepdims=True))


def axis_angle_to_quaternion(aa: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> quaternion (..., 4) wijk.

    Uses a Taylor expansion of sin(t/2)/t near zero so the map is smooth at aa = 0.
    """
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-4
    # sin(half)/angle; Taylor: 0.5 - angle^2 / 48
    sin_half_over = jnp.where(small, 0.5 - (angle * angle) / 48.0,
                              jnp.sin(half) / jnp.where(small, 1.0, angle))
    return jnp.concatenate((jnp.cos(half), aa * sin_half_over), axis=-1)


def axis_angle_to_quaternion_near_zero(aa: jax.Array) -> jax.Array:
    """Taylor-expanded axis-angle -> quaternion, valid only near zero.

    Third-order differentiable at aa = 0 (the structure of the sin/cos Taylor series
    makes it so); used as the local chart for pose perturbations. Mirrors the
    semantics of reference lib/nll/pnp_utils.py:22 (axis_angle_to_quaternion_near_zero).
    """
    sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    return jnp.concatenate((1.0 - sq / 8.0, aa * (0.5 - sq / 48.0)), axis=-1)


def quaternion_to_axis_angle(q: jax.Array) -> jax.Array:
    """Quaternion (..., 4) wijk -> axis-angle (..., 3)."""
    q = standardize_quaternion(q)
    v = q[..., 1:]
    norm_v = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm_v, q[..., :1])
    small = norm_v < 1e-8
    scale = jnp.where(small, 2.0, angle / jnp.where(small, 1.0, norm_v))
    return v * scale


def axis_angle_to_matrix(aa: jax.Array) -> jax.Array:
    return quaternion_to_matrix(axis_angle_to_quaternion(aa))


def matrix_to_axis_angle(m: jax.Array) -> jax.Array:
    return quaternion_to_axis_angle(matrix_to_quaternion(m))


def quaternion_apply(q: jax.Array, p: jax.Array) -> jax.Array:
    """Rotate points p (..., 3) by unit quaternions q (..., 4) wijk.

    Uses the expanded cross-product form (15 mul) instead of q * p * q^-1
    (reference rotation_conversions.py quaternion_apply) — fewer ops, VPU-friendly.
    """
    w, v = q[..., :1], q[..., 1:]
    c = jnp.cross(v, p)
    return p + 2.0 * (w * c + jnp.cross(v, c))


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """Zhou et al. continuous 6D rep (..., 6) -> rotation matrix (..., 3, 3).

    Gram-Schmidt on the two encoded rows (reference rotation_conversions.py:559).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.clip(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    a2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 / jnp.clip(jnp.linalg.norm(a2, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-2)


def matrix_to_rotation_6d(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> 6D rep (..., 6): the first two rows."""
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def _axis_rotation(axis: str, angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == 'X':
        flat = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == 'Y':
        flat = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == 'Z':
        flat = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError(axis)
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler: jax.Array, convention: str = 'XYZ') -> jax.Array:
    """Extrinsic-composition Euler angles (..., 3) -> matrix, matching the
    pytorch3d semantics the reference vendors (rotation_conversions.py):
    R = R(conv[0], e0) @ R(conv[1], e1) @ R(conv[2], e2).
    Proper-Euler conventions (e.g. ZYZ) are valid; adjacent repeats are not."""
    if len(convention) != 3 or any(c not in 'XYZ' for c in convention) \
            or convention[0] == convention[1] or convention[1] == convention[2]:
        raise ValueError(convention)
    ms = [_axis_rotation(c, euler[..., i]) for i, c in enumerate(convention)]
    return ms[0] @ ms[1] @ ms[2]


def matrix_to_euler_angles(m: jax.Array, convention: str = 'XYZ') -> jax.Array:
    """Matrix (..., 3, 3) -> Euler angles (..., 3), inverse of
    euler_angles_to_matrix for distinct-axis (Tait-Bryan) conventions."""
    if len(convention) != 3 or len(set(convention)) != 3 \
            or any(c not in 'XYZ' for c in convention):
        raise ValueError(convention)
    i0, i2 = 'XYZ'.index(convention[0]), 'XYZ'.index(convention[2])
    i1 = 3 - i0 - i2
    tait_sign = 1.0 if i2 - i0 in (2, -1) else -1.0  # even perm => +sin at m[i0,i2]
    central = jnp.arcsin(jnp.clip(tait_sign * m[..., i0, i2], -1.0, 1.0))
    a0 = jnp.arctan2(-tait_sign * m[..., i1, i2], m[..., i2, i2])
    a2 = jnp.arctan2(-tait_sign * m[..., i0, i1], m[..., i0, i0])
    return jnp.stack((a0, central, a2), axis=-1)


def skew_symmetric(v: jax.Array) -> jax.Array:
    """(..., 3) -> skew-symmetric (..., 3, 3) such that skew(v) @ p = v × p."""
    a0, a1, a2 = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(a0)
    rows = jnp.stack(
        (zero, -a2, a1,
         a2, zero, -a0,
         -a1, a0, zero),
        axis=-1,
    )
    return rows.reshape(v.shape[:-1] + (3, 3))
