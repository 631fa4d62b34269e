"""6D pose error metrics, on-device and batched.

Semantics match reference lib/utils/error6d.py (bop_toolkit-derived). The ADI
nearest-neighbor search replaces the host cKDTree with a brute-force pairwise
min-distance — models_eval meshes are a few thousand vertices, so the (N, N)
distance matrix is tiny by MXU standards and the whole eval batch runs in one jit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _transform(pts, R, t):
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def add_err(R_est, t_est, R_gt, t_gt, pts):
    """Mean distance between corresponding transformed model points (ACCV'12)."""
    d = _transform(pts, R_est, t_est) - _transform(pts, R_gt, t_gt)
    return jnp.mean(jnp.linalg.norm(d, axis=-1), axis=-1)


def adi_err(R_est, t_est, R_gt, t_gt, pts):
    """Mean distance to the nearest estimated point, for indistinguishable views."""
    est = _transform(pts, R_est, t_est)
    gt = _transform(pts, R_gt, t_gt)
    # center both sets (min-distance is invariant to a common shift): keeps the
    # |g|²+|e|²−2g·e expansion numerically safe in f32 despite ~10³ mm translations
    center = jnp.mean(gt, axis=-2, keepdims=True)
    gt = gt - center
    est = est - center
    # ||g - e||² = |g|² + |e|² - 2 g·e ; the cross term is one big matmul.
    # The expansion is only used to *select* the nearest neighbor; the returned
    # distance is recomputed exactly on the gathered pair (immune to the f32
    # cancellation the expansion suffers at small distances).
    g2 = jnp.sum(gt * gt, axis=-1)[..., :, None]
    e2 = jnp.sum(est * est, axis=-1)[..., None, :]
    cross = gt @ jnp.swapaxes(est, -1, -2)
    d2 = g2 + e2 - 2.0 * cross
    nn = jnp.argmin(d2, axis=-1)                              # (..., N)
    nearest = jnp.take_along_axis(est, nn[..., None], axis=-2)
    return jnp.mean(jnp.linalg.norm(gt - nearest, axis=-1), axis=-1)


def re_err(R_est, R_gt):
    """Rotation geodesic error in degrees. trace(A Bᵀ) as an elementwise sum —
    exact in f32, immune to matmul-precision settings."""
    cos = 0.5 * (jnp.sum(R_est * R_gt, axis=(-2, -1)) - 1.0)
    return jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


def te_err(t_est, t_gt):
    return jnp.linalg.norm(t_est - t_gt, axis=-1)


def mssd_err(R_est, t_est, R_gt, t_gt, pts, sym_R, sym_t):
    """Maximum Symmetry-aware Surface Distance (BOP'19). sym_R (S, 3, 3),
    sym_t (S, 3): symmetry transforms including identity. Reference
    lib/utils/error6d.py:36-58."""
    est = _transform(pts, R_est, t_est)                       # (..., N, 3)
    R_sym = R_gt[..., None, :, :] @ sym_R                     # (..., S, 3, 3)
    t_sym = (R_gt[..., None, :, :] @ sym_t[..., :, None])[..., 0] \
        + t_gt[..., None, :]
    gt_sym = _transform(pts[..., None, :, :], R_sym, t_sym)   # (..., S, N, 3)
    d = jnp.linalg.norm(est[..., None, :, :] - gt_sym, axis=-1)
    return jnp.min(jnp.max(d, axis=-1), axis=-1)


def mspd_err(R_est, t_est, R_gt, t_gt, K, pts, sym_R, sym_t):
    """Maximum Symmetry-aware Projection Distance (BOP'19). Reference
    lib/utils/error6d.py:61-84."""
    def project(R, t, p):
        cam = _transform(p, R, t)
        h = cam @ jnp.swapaxes(K, -1, -2)
        return h[..., :2] / h[..., 2:3]

    proj_est = project(R_est, t_est, pts)                     # (..., N, 2)
    R_sym = R_gt[..., None, :, :] @ sym_R
    t_sym = (R_gt[..., None, :, :] @ sym_t[..., :, None])[..., 0] \
        + t_gt[..., None, :]
    cam = _transform(pts[..., None, :, :], R_sym, t_sym)      # (..., S, N, 3)
    h = cam @ jnp.swapaxes(K[..., None, :, :], -1, -2)
    proj_sym = h[..., :2] / h[..., 2:3]
    d = jnp.linalg.norm(proj_est[..., None, :, :] - proj_sym, axis=-1)
    return jnp.min(jnp.max(d, axis=-1), axis=-1)


def proj_err(R_est, t_est, R_gt, t_gt, K, pts):
    """Mean 2D projection distance (Brachmann CVPR'16)."""
    def project(R, t):
        cam = _transform(pts, R, t)
        h = cam @ jnp.swapaxes(K, -1, -2)
        return h[..., :2] / h[..., 2:3]
    return jnp.mean(jnp.linalg.norm(project(R_est, t_est) - project(R_gt, t_gt),
                                    axis=-1), axis=-1)


@functools.partial(jax.jit, donate_argnums=())
def _batched_errors_jit(R_est, t_est, R_gt, t_gt, pts):
    return dict(
        add=add_err(R_est, t_est, R_gt, t_gt, pts),
        adi=adi_err(R_est, t_est, R_gt, t_gt, pts),
        re=re_err(R_est, R_gt),
        te=te_err(t_est, t_gt),
    )


def batched_pose_errors(R_est: np.ndarray, t_est: np.ndarray, R_gt: np.ndarray,
                        t_gt: np.ndarray, pts: np.ndarray,
                        chunk: int = 64) -> dict:
    """Host API: numpy in/out, chunked over instances to bound the (B, N, N) ADI
    intermediate. pts is shared across the batch (single-object eval) or (B, N, 3)."""
    B = len(R_est)
    outs: list[dict] = []
    for i in range(0, B, chunk):
        sl = slice(i, min(i + chunk, B))
        p = pts[sl] if pts.ndim == 3 else pts
        outs.append(jax.tree.map(np.asarray, _batched_errors_jit(
            jnp.asarray(R_est[sl]), jnp.asarray(t_est[sl]),
            jnp.asarray(R_gt[sl]), jnp.asarray(t_gt[sl]), jnp.asarray(p))))
    return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
