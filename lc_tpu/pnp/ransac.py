"""Batched RANSAC PnP initializer — the cv2.solvePnPRansac replacement.

The reference round-trips every batch to a host multiprocessing pool running
OpenCV EPnP+RANSAC per instance (reference lib/pnp/cv2_solver.py:8-108,
test.py:120). Here the whole batch solves on-device: all `num_hypotheses`
minimal-subset solves run as one batched inhomogeneous DLT (11×11 Cholesky each),
inlier counting is one vectorized reprojection pass, and the winning hypothesis is
re-fit on its inliers with a mask-weighted DLT. Rotations come from Newton–Schulz
polar iteration; every tiny contraction is VPU elementwise (ops/smallmat.py).

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

from ..geom.rotations import matrix_to_quaternion
from ..ops.smallmat import rot_pts, mm_small


def _det3(M):
    """Closed-form 3x3 determinant (jnp.linalg.det LU-factorizes, slow batched)."""
    return (M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1])
            - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 0])
            + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0]))


class RansacResult(NamedTuple):
    pose7: jax.Array        # (B, 7)
    invalid: jax.Array      # (B,) bool
    inliers: jax.Array      # (B, N) bool, inlier mask of the winning hypothesis
    n_inliers: jax.Array    # (B,)


def _polar_rotation(M: jax.Array, iters: int = 12) -> jax.Array:
    """Orthogonal polar factor of (..., 3, 3) via Newton–Schulz — pure matmuls
    (no 3×3 SVD, which lowers to a slow iterative kernel on TPU)."""
    norm = jnp.linalg.norm(M, axis=(-2, -1), keepdims=True)
    X = M / jnp.maximum(norm, 1e-20)
    for _ in range(iters):
        X = 1.5 * X - 0.5 * mm_small(mm_small(X, jnp.swapaxes(X, -1, -2)), X)
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
    xy_norm = rot_pts(xy1, inv_K)[..., :2]

    # standard DLT normalization: center + unit-RMS scale the 3D points so AtA is
    # well-conditioned in f32 (raw mm coords give condition numbers ~1e6)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-6)
    c3d = jnp.sum(pts3d * w[..., None], axis=-2, keepdims=True) / wsum[..., None]
    Xc = pts3d - c3d
    s3d = jnp.sqrt(jnp.sum(jnp.sum(Xc * Xc, axis=-1) * w, axis=-1,
                           keepdims=True) / wsum / 3.0)
    s3d = jnp.maximum(s3d, 1e-6)
    Xn = Xc / s3d[..., None]

    Xh = jnp.concatenate((Xn, ones), axis=-1)                  # (..., N, 4)
    zeros = jnp.zeros_like(Xh)
    u = xy_norm[..., 0:1]
    v = xy_norm[..., 1:2]
    row_u = jnp.concatenate((Xh, zeros, -u * Xn), axis=-1)     # (..., N, 11)
    row_v = jnp.concatenate((zeros, Xh, -v * Xn), axis=-1)
    A = jnp.concatenate((row_u, row_v), axis=-2)               # (..., 2N, 11)
    b = jnp.concatenate((xy_norm[..., 0], xy_norm[..., 1]), axis=-1)  # (..., 2N)
    wr = jnp.concatenate((w, w), axis=-1)

    Aw = A * wr[..., None]                                     # (..., 2N, 11)
    AtA = jnp.sum(Aw[..., :, None] * A[..., None, :], axis=-3)  # VPU outer-accum
    AtA = AtA + 1e-8 * jnp.eye(11, dtype=A.dtype)
    Atb = jnp.sum(Aw * b[..., None], axis=-2)
    from ..ops.smallmat import chol_solve_small
    x, chol_ok = chol_solve_small(AtA, Atb)   # unrolled: batched-linalg-free

    # solved P' = λ'[R | t'] for X' = (X - c)/s: R is shared, λ' = λ·s,
    # t' relates by t = t'/λ − R·c
    M = jnp.stack((x[..., 0:3], x[..., 4:7], x[..., 8:11]), axis=-2)
    t_vec = jnp.stack((x[..., 3], x[..., 7], jnp.ones_like(x[..., 3])), axis=-1)
    R = _polar_rotation(M)
    lam_p = jnp.sum(R * M, axis=(-2, -1)) / 3.0               # trace(RᵀM)/3 = λ·s
    lam = lam_p / s3d[..., 0]
    ok = chol_ok & (lam > 1e-12) & (_det3(R) > 0)
    Rc = jnp.sum(R * c3d[..., 0, None, :], axis=-1)            # (..., 3) R @ c
    t = t_vec / jnp.maximum(lam, 1e-12)[..., None] - Rc
    return jnp.concatenate((matrix_to_quaternion(R), t), axis=-1), ok


def _reproj_err(pose_R, pose_t, cam_K, pts3d, pts2d):
    cam = rot_pts(pts3d, pose_R) + pose_t[..., None, :]
    h = rot_pts(cam, cam_K)
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
    # static shapes, no rejection loops. k iterated argmaxes instead of
    # lax.top_k: same index set, ~1.6× faster on TPU for tiny k (top_k pays a
    # partial-sort regardless of k).
    gumbel = jax.random.gumbel(key, (B, num_hypotheses, N))
    scores = jnp.where(valid[:, None, :], gumbel, -jnp.inf)
    ar = jnp.arange(N)
    cols = []
    for _ in range(sample_size):
        i = jnp.argmax(scores, axis=-1)
        cols.append(i)
        scores = jnp.where(ar == i[..., None], -jnp.inf, scores)
    idx = jnp.stack(cols, axis=-1)                           # (B, K, s)

    # take_along_axis broadcasts the size-1 hypothesis dim: no (B, K, N, ·)
    # materialization (the .repeat form wrote 2×59 MB of HBM at B=32, K=150)
    take = lambda arr: jnp.take_along_axis(  # noqa: E731
        arr[:, None], idx[..., None], axis=2)
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

    # local optimization (LO-RANSAC): re-fit on the winning inlier set with EPnP
    # (OpenCV's final on-inliers estimator), polish with a short unweighted
    # Gauss-Newton, then recount inliers with the polished model. Without the
    # polish the minimal-sample estimators' bias (several px of systematic
    # reprojection error under noise) undercounts the inlier set.
    from .solver import lm_refine_auto as lm_refine
    from .epnp import epnp
    refit_pose, refit_ok = epnp(cam_K, pts3d, pts2d, best_inl.astype(jnp.float32))
    enough = n_inl >= sample_size
    use_refit = refit_ok & enough
    pose = jnp.where(use_refit[:, None], refit_pose, best_pose)

    polish = lm_refine(pose, cam_K, pts3d, pts2d,
                       jnp.ones_like(pts2d), valid=best_inl & valid,
                       max_iter=10)
    pose = jnp.where(polish.invalid[:, None], pose, polish.pose7)

    R_f = quaternion_to_matrix(pose[..., :4])
    err_f = _reproj_err(R_f, pose[..., 4:7], cam_K, pts3d, pts2d)
    best_inl = (err_f < thr[:, None]) & valid
    n_inl = jnp.sum(best_inl, axis=-1)

    invalid = n_inl < 4
    return RansacResult(pose7=pose, invalid=invalid, inliers=best_inl,
                        n_inliers=n_inl)
