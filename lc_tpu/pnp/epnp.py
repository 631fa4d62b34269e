"""Batched EPnP (Lepetit et al.) — OpenCV's SOLVEPNP_EPNP equivalent.

Used as the final on-inliers fit inside RANSAC (matching cv2.solvePnPRansac's
output stage; reference lib/pnp/cv2_solver.py:72-75). Minimal-sample hypotheses
stay on the cheaper normalized DLT (ransac.py) — after the LO Gauss-Newton polish
the two agree to solver precision, but EPnP is the reference-faithful estimator.

All-jnp: control points from the weighted PCA frame, barycentric coordinates via a
3×3 solve, the 12×12 null space via eigh of MᵀM, the N=1 β with a 4-β Gauss-Newton
refinement on the 6 inter-control-point distance constraints (OpenCV's
compute_betas + gauss_newton), and pose recovery by weighted Procrustes using the
same Newton–Schulz polar factor as the DLT path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geom.rotations import matrix_to_quaternion
from ..ops.smallmat import (chol_solve_small, jacobi_eigh_small, rot_pts,
                            smallest_eigvecs)


def _control_points(pts3d: jax.Array, w: jax.Array, sweeps: int = 8
                    ) -> jax.Array:
    """(..., N, 3), (..., N) -> 4 control points (..., 4, 3): centroid + PCA axes."""
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    c0 = jnp.sum(pts3d * w[..., None], axis=-2) / wsum          # (..., 3)
    centered = (pts3d - c0[..., None, :]) * jnp.sqrt(w)[..., None]
    cov = jnp.einsum('...ni,...nj->...ij', centered, centered) / wsum[..., None]
    eigval, eigvec = jacobi_eigh_small(cov, sweeps=sweeps)      # ascending
    scale = jnp.sqrt(jnp.maximum(eigval, 1e-9))                 # (..., 3)
    axes = jnp.swapaxes(eigvec, -1, -2) * scale[..., None]      # rows = axes
    return jnp.concatenate((c0[..., None, :],
                            c0[..., None, :] + axes), axis=-2)  # (..., 4, 3)


def _barycentric(pts3d: jax.Array, ctrl: jax.Array) -> jax.Array:
    """alphas (..., N, 4) with Σα = 1 and pts = Σ α_j ctrl_j."""
    basis = ctrl[..., 1:, :] - ctrl[..., 0:1, :]                # (..., 3, 3) rows
    rel = pts3d - ctrl[..., 0:1, :]                             # (..., N, 3)
    from ..ops.smallmat import inv3
    inv = inv3(jnp.swapaxes(basis, -1, -2))                     # cols -> coefs
    beta = rot_pts(rel, inv)                                    # (..., N, 3)
    alpha0 = 1.0 - jnp.sum(beta, axis=-1, keepdims=True)
    return jnp.concatenate((alpha0, beta), axis=-1)


def _dists6(c: jax.Array) -> jax.Array:
    """Six pairwise distances of 4 points (..., 4, 3) -> (..., 6)."""
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    return jnp.stack([jnp.linalg.norm(c[..., i, :] - c[..., j, :], axis=-1)
                      for i, j in pairs], axis=-1)


def epnp(cam_K: jax.Array, pts3d: jax.Array, pts2d: jax.Array,
         w: jax.Array | None = None, gn_iters: int = 8, eig_iters: int = 6,
         cp_sweeps: int = 8) -> tuple[jax.Array, jax.Array]:
    """EPnP pose. cam_K (..., 3, 3); pts3d (..., N, 3); pts2d (..., N, 2);
    w (..., N) weights/mask. Returns (pose7 (..., 7), ok (...)).

    gn_iters/eig_iters trade precision for FLOPs: the defaults suit the final
    on-inliers fit; RANSAC minimal-sample hypotheses use reduced counts (their
    noise floor is set by the 6-point sample, not the solver — consensus
    scoring absorbs the residual solver error)."""
    if w is None:
        w = jnp.ones(pts2d.shape[:-1], pts2d.dtype)
    fx = cam_K[..., 0, 0][..., None]
    fy = cam_K[..., 1, 1][..., None]
    cx = cam_K[..., 0, 2][..., None]
    cy = cam_K[..., 1, 2][..., None]

    ctrl_w = _control_points(pts3d, w, sweeps=cp_sweeps)        # (..., 4, 3)
    alphas = _barycentric(pts3d, ctrl_w)                        # (..., N, 4)

    # M rows: Σ_j α_j [f_x x_j + (c_x - u) z_j] = 0 (and the v row); unknowns are
    # the 4 camera-frame control points flattened (..., 12)
    u = pts2d[..., 0]
    v = pts2d[..., 1]
    a = alphas                                                  # (..., N, 4)
    zeros = jnp.zeros_like(a)
    row_u = jnp.concatenate(
        (a * fx[..., None], zeros, a * (cx - u)[..., None]), axis=-1)
    row_v = jnp.concatenate(
        (zeros, a * fy[..., None], a * (cy - v)[..., None]), axis=-1)
    # interleave per control point: unknown order (x1..x4, y1..y4, z1..z4)
    M = jnp.concatenate((row_u, row_v), axis=-2)                # (..., 2N, 12)
    wr = jnp.concatenate((w, w), axis=-1)
    Mw = M * wr[..., None]
    MtM = jnp.sum(Mw[..., :, None] * M[..., None, :], axis=-3)  # (..., 12, 12)

    # 4 smallest eigenvectors of the 12×12 normal matrix. jnp.linalg.eigh's
    # loop-based kernel is the single most expensive op of the whole solve on
    # TPU (and its remote compile can take minutes); the unrolled inverse
    # subspace iteration recovers the near-null space to ~1e-7 subspace angle
    # (the gap to the data-scale spectrum is orders of magnitude).
    V, _ = smallest_eigvecs(MtM, 4, iters=eig_iters)            # (..., 12, 4)
    # camera control candidates per basis vector k: (..., 4(k), 4(pt), 3)
    Vc = jnp.stack([V[..., k].reshape(V.shape[:-2] + (3, 4)).swapaxes(-1, -2)
                    for k in range(4)], axis=-3)

    d_w = _dists6(ctrl_w)                                       # (..., 6)
    d_v = _dists6(Vc[..., 0, :, :])                             # case N=1 basis
    beta1 = jnp.sum(d_v * d_w, axis=-1) / jnp.maximum(
        jnp.sum(d_v * d_v, axis=-1), 1e-12)
    betas = jnp.stack([beta1, jnp.zeros_like(beta1),
                       jnp.zeros_like(beta1), jnp.zeros_like(beta1)], axis=-1)

    # Gauss-Newton on the 6 distance constraints over the 4 betas
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    diffs = jnp.stack([Vc[..., :, i, :] - Vc[..., :, j, :]
                       for i, j in pairs], axis=-3)             # (..., 6, 4k, 3)

    def gn_step(b, _):
        e = jnp.einsum('...k,...pkd->...pd', b, diffs)          # (..., 6, 3)
        r = jnp.sum(e * e, axis=-1) - d_w ** 2                  # (..., 6)
        J = 2.0 * jnp.einsum('...pd,...pkd->...pk', e, diffs)   # (..., 6, 4)
        JtJ = jnp.sum(J[..., :, None] * J[..., None, :], axis=-3)
        JtJ = JtJ + 1e-9 * jnp.eye(4, dtype=J.dtype)
        Jtr = jnp.sum(J * r[..., None], axis=-2)
        db, _ = chol_solve_small(JtJ, Jtr)
        return b - jnp.nan_to_num(db), None
    betas, _ = jax.lax.scan(gn_step, betas, None, length=gn_iters)

    ctrl_c = jnp.einsum('...k,...kpd->...pd', betas, Vc)        # (..., 4, 3)
    # cheirality: the weighted centroid must be in front of the camera
    depth = jnp.einsum('...np,...pd->...nd', alphas, ctrl_c)[..., 2]
    mean_z = jnp.sum(depth * w, axis=-1)
    ctrl_c = ctrl_c * jnp.where(mean_z < 0, -1.0, 1.0)[..., None, None]

    # Procrustes world->camera on the 4 control points (equal weights)
    mu_w = jnp.mean(ctrl_w, axis=-2, keepdims=True)
    mu_c = jnp.mean(ctrl_c, axis=-2, keepdims=True)
    H = jnp.einsum('...pi,...pj->...ij', ctrl_c - mu_c, ctrl_w - mu_w)
    from .ransac import _polar_rotation, _det3
    R = _polar_rotation(H)
    ok = _det3(R) > 0
    t = mu_c[..., 0, :] - matvec_rows(R, mu_w[..., 0, :])
    pose = jnp.concatenate((matrix_to_quaternion(R), t), axis=-1)
    # near-planar/degenerate samples can blow up the barycentric basis inverse
    # into inf/NaN; scrub to a benign pose and fold into ok so consensus
    # scoring (or the caller's invalid fallback) rejects it — NaN would
    # otherwise poison every jnp.where downstream
    finite = jnp.all(jnp.isfinite(pose), axis=-1)
    ok = ok & finite
    default = jnp.zeros_like(pose).at[..., 0].set(1.0).at[..., 6].set(1.0)
    return jnp.where(finite[..., None], pose, default), ok


def matvec_rows(R: jax.Array, x: jax.Array) -> jax.Array:
    return jnp.sum(R * x[..., None, :], axis=-1)
