"""Batched RANSAC PnP initializer — the cv2.solvePnPRansac replacement.

The reference round-trips every batch to a host multiprocessing pool running
OpenCV EPnP+RANSAC per instance (reference lib/pnp/cv2_solver.py:8-108,
test.py:120). Here the whole batch solves on-device: all `num_hypotheses`
minimal-subset solves run as one vmapped DLT (a 12×12 eigendecomposition each),
inlier counting is a single einsum-shaped reprojection pass, and the winning
hypothesis is re-fit on its inliers with a mask-weighted DLT.

The minimal solver is a normalized DLT on 6 points rather than EPnP-on-5: with
pixels premultiplied by K⁻¹ the projection matrix is λ[R|t] directly, and R is
recovered by orthogonal Procrustes — all batched linear algebra that XLA maps
well. Parity with OpenCV is statistical (same inlier threshold semantics,
reprojectionError in pixels; 150 hypotheses ≈ iterationsCount=150), which is the
strongest guarantee the reference itself offers (RANSAC RNG differs run to run).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom.pose import RT_to_pose7
from ..geom.rotations import matrix_to_quaternion


class RansacResult(NamedTuple):
    pose7: jax.Array        # (B, 7)
    invalid: jax.Array      # (B,) bool
    inliers: jax.Array      # (B, N) bool, inlier mask of the winning hypothesis
    n_inliers: jax.Array    # (B,)


def _dlt_homogeneous(pts3d: jax.Array, xy_norm: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted DLT: smallest eigenvector of AᵀWA -> P (..., 3, 4).

    pts3d: (..., N, 3); xy_norm: (..., N, 2) normalized image coords (K⁻¹ applied);
    w: (..., N) row weights (0/1 masks or soft weights).
    """
    ones = jnp.ones_like(pts3d[..., :1])
    Xh = jnp.concatenate((pts3d, ones), axis=-1)             # (..., N, 4)
    zeros = jnp.zeros_like(Xh)
    u = xy_norm[..., 0:1]
    v = xy_norm[..., 1:2]
    row_u = jnp.concatenate((Xh, zeros, -u * Xh), axis=-1)   # (..., N, 12)
    row_v = jnp.concatenate((zeros, Xh, -v * Xh), axis=-1)
    A = jnp.concatenate((row_u, row_v), axis=-2)             # (..., 2N, 12)
    wr = jnp.concatenate((w, w), axis=-1)                    # (..., 2N)
    AtA = jnp.einsum('...ni,...n,...nj->...ij', A, wr, A)    # (..., 12, 12)
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[..., 0]                                         # smallest eigenvector
    return p.reshape(p.shape[:-1] + (3, 4))


def _pose_from_P(P: jax.Array, pts3d: jax.Array, w: jax.Array
                 ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Extract (R, t, ok) from a scaled projection P ≈ λ[R|t] with cheirality fix."""
    ones = jnp.ones_like(pts3d[..., :1])
    Xh = jnp.concatenate((pts3d, ones), axis=-1)
    depth = jnp.einsum('...j,...nj->...n', P[..., 2, :], Xh)
    mean_depth = jnp.sum(depth * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    P = P * jnp.where(mean_depth < 0, -1.0, 1.0)[..., None, None]

    M = P[..., :3]
    U, S, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = U @ (D[..., :, None] * Vt)
    scale = jnp.sum(S * D, axis=-1) / 3.0
    ok = scale > 1e-12
    t = P[..., 3] / jnp.maximum(scale, 1e-12)[..., None]
    return R, t, ok


def _polar_rotation(M: jax.Array, iters: int = 12) -> jax.Array:
    """Orthogonal polar factor of (..., 3, 3) via Newton–Schulz — pure matmuls
    (no 3×3 SVD, which lowers to a slow iterative kernel on TPU)."""
    norm = jnp.linalg.norm(M, axis=(-2, -1), keepdims=True)
    X = M / jnp.maximum(norm, 1e-20)
    for _ in range(iters):
        X = 1.5 * X - 0.5 * X @ jnp.swapaxes(X, -1, -2) @ X
    return X


def dlt_pnp(cam_K: jax.Array, pts3d: jax.Array, pts2d: jax.Array,
            w: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """Direct linear transform PnP. Returns (pose7 (..., 7), ok (...)).

    Inhomogeneous formulation with P[2,3] fixed to 1 (valid whenever t_z > 0,
    always true for objects in front of the camera): an 11-unknown weighted
    least-squares solved by 11×11 Cholesky — batched MXU work instead of the
    12×12 eigendecomposition of the homogeneous DLT. Cheirality is built in
    (the true solution has scale λ = 1/t_z > 0).
    """
    if w is None:
        w = jnp.ones(pts2d.shape[:-1], pts2d.dtype)
    inv_K = jnp.linalg.inv(cam_K)
    ones = jnp.ones_like(pts2d[..., :1])
    xy1 = jnp.concatenate((pts2d, ones), axis=-1)
    xy_norm = (xy1 @ jnp.swapaxes(inv_K, -1, -2))[..., :2]

    Xh = jnp.concatenate((pts3d, ones), axis=-1)              # (..., N, 4)
    zeros = jnp.zeros_like(Xh)
    u = xy_norm[..., 0:1]
    v = xy_norm[..., 1:2]
    row_u = jnp.concatenate((Xh, zeros, -u * pts3d), axis=-1)  # (..., N, 11)
    row_v = jnp.concatenate((zeros, Xh, -v * pts3d), axis=-1)
    A = jnp.concatenate((row_u, row_v), axis=-2)               # (..., 2N, 11)
    b = jnp.concatenate((xy_norm[..., 0], xy_norm[..., 1]), axis=-1)  # (..., 2N)
    wr = jnp.concatenate((w, w), axis=-1)

    AtA = jnp.einsum('...ni,...n,...nj->...ij', A, wr, A)
    AtA = AtA + 1e-8 * jnp.eye(11, dtype=A.dtype)
    Atb = jnp.einsum('...ni,...n,...n->...i', A, wr, b)
    L = jnp.linalg.cholesky(AtA)
    chol_ok = jnp.logical_not(jnp.any(jnp.isnan(L), axis=(-1, -2)))
    L = jnp.where(chol_ok[..., None, None], L, jnp.eye(11, dtype=A.dtype))
    x = jax.scipy.linalg.cho_solve((L, True), Atb[..., None])[..., 0]

    M = jnp.stack((x[..., 0:3], x[..., 4:7], x[..., 8:11]), axis=-2)
    t_vec = jnp.stack((x[..., 3], x[..., 7], jnp.ones_like(x[..., 3])), axis=-1)
    R = _polar_rotation(M)
    lam = jnp.einsum('...ij,...ij->...', R, M) / 3.0          # trace(RᵀM)/3
    ok = chol_ok & (lam > 1e-12) & (jnp.linalg.det(R) > 0)
    t = t_vec / jnp.maximum(lam, 1e-12)[..., None]
    return jnp.concatenate((matrix_to_quaternion(R), t), axis=-1), ok


def _reproj_err(pose_R, pose_t, cam_K, pts3d, pts2d):
    cam = pts3d @ jnp.swapaxes(pose_R, -1, -2) + pose_t[..., None, :]
    h = cam @ jnp.swapaxes(cam_K, -1, -2)
    uv = h[..., :2] / jnp.maximum(h[..., 2:3], 1e-6)
    behind = cam[..., 2] <= 0
    err = jnp.linalg.norm(uv - pts2d, axis=-1)
    return jnp.where(behind, jnp.inf, err)


def ransac_pnp(cam_K: jax.Array, pts3d: jax.Array, pts2d: jax.Array,
               key: jax.Array, valid: jax.Array | None = None, *,
               reproj_threshold: jax.Array | float = 3.0,
               num_hypotheses: int = 150, sample_size: int = 6) -> RansacResult:
    """Robust pose init for a batch of correspondence sets.

    cam_K: (B, 3, 3); pts3d: (B, N, 3); pts2d: (B, N, 2); valid: (B, N) mask for
    padded points; reproj_threshold: scalar or (B,) pixels (reference test.py:57,115
    uses 2 or 3 px, optionally scaled by the crop's pixel scale).
    """
    B, N = pts2d.shape[:2]
    if valid is None:
        valid = jnp.ones((B, N), bool)
    thr = jnp.broadcast_to(jnp.asarray(reproj_threshold, jnp.float32), (B,))

    # Gumbel top-k sampling of `sample_size` distinct valid indices per hypothesis —
    # static shapes, no rejection loops.
    gumbel = jax.random.gumbel(key, (B, num_hypotheses, N))
    scores = jnp.where(valid[:, None, :], gumbel, -jnp.inf)
    _, idx = jax.lax.top_k(scores, sample_size)              # (B, K, s)

    take = lambda arr: jnp.take_along_axis(  # noqa: E731
        arr[:, None].repeat(num_hypotheses, 1), idx[..., None], axis=2)
    sub3d = take(pts3d)                                      # (B, K, s, 3)
    sub2d = take(pts2d)[..., :2]                             # (B, K, s, 2)

    pose_h, ok_h = dlt_pnp(cam_K[:, None], sub3d, sub2d)     # (B, K, 7), (B, K)

    from ..geom.rotations import quaternion_to_matrix
    R_h = quaternion_to_matrix(pose_h[..., :4])
    err = _reproj_err(R_h, pose_h[..., 4:7], cam_K[:, None], pts3d[:, None],
                      pts2d[:, None])                        # (B, K, N)
    inl = (err < thr[:, None, None]) & valid[:, None, :]
    counts = jnp.sum(inl, axis=-1)                           # (B, K)
    counts = jnp.where(ok_h, counts, -1)

    best = jnp.argmax(counts, axis=-1)                       # (B,)
    best_inl = jnp.take_along_axis(inl, best[:, None, None], axis=1)[:, 0]  # (B, N)
    n_inl = jnp.take_along_axis(counts, best[:, None], axis=1)[:, 0]
    best_pose = jnp.take_along_axis(pose_h, best[:, None, None], axis=1)[:, 0]

    # final model: re-fit on the winning inlier set (OpenCV refines on inliers too)
    refit_pose, refit_ok = dlt_pnp(cam_K, pts3d, pts2d, best_inl.astype(jnp.float32))
    enough = n_inl >= sample_size
    use_refit = refit_ok & enough
    pose = jnp.where(use_refit[:, None], refit_pose, best_pose)

    invalid = n_inl < 4
    return RansacResult(pose7=pose, invalid=invalid, inliers=best_inl,
                        n_inliers=n_inl)
