"""Batched RANSAC PnP initializer — the cv2.solvePnPRansac replacement.

The reference round-trips every batch to a host multiprocessing pool running
OpenCV EPnP+RANSAC per instance (reference lib/pnp/cv2_solver.py:8-108,
test.py:120). Here the whole batch solves on-device: all `num_hypotheses`
minimal-subset solves run as one batched EPnP (unrolled 12×12 subspace
iteration each — matching OpenCV's SOLVEPNP_EPNP hypothesis estimator), inlier
counting is one vectorized reprojection pass, and the winner goes through
iterative local optimization (EPnP refit on inliers + recount↔Gauss-Newton
rounds). Rotations come from Newton–Schulz polar iteration; every tiny
contraction is VPU elementwise (ops/smallmat.py).

Parity with OpenCV is statistical (same inlier threshold semantics,
reprojectionError in pixels; 150 hypotheses ≈ iterationsCount=150), pinned by
tests/test_parity_ransac.py: on identical problem sets across noise
σ∈{1,2,4} px × outliers {0,20,40}%, pose-error quantiles are at or below
cv2.solvePnPRansac's — the strongest guarantee the reference itself offers
(OpenCV's RANSAC RNG differs run to run). A normalized-DLT minimal solver
(dlt_pnp below) is kept for callers wanting the cheaper estimator, but is no
longer the hypothesis path: at minimal sample size its 11-unknown system has
no redundancy and noise amplification put best-consensus rotation error at
38° vs EPnP's 2.9° (4 px noise).
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


def planar_pnp(cam_K: jax.Array, pts3d: jax.Array, pts2d: jax.Array,
               w: jax.Array | None = None, pca_sweeps: int = 8
               ) -> tuple[jax.Array, jax.Array]:
    """Pose for (near-)planar point sets. Returns (pose7 (..., 7), ok (...)).

    EPnP's 4-control-point frame and the 11-unknown DLT both collapse when the
    3D points are coplanar (rank-deficient basis / normal matrix) — and planar
    targets are routine (FPS keypoint grids on one box face, flat objects).
    Here: project points into their weighted-PCA plane frame, solve the 8-DOF
    image↔plane homography by ridge Cholesky (8×8, batched elementwise), and
    decompose Zhang-style (λ from the two rotation columns, r3 = r1×r2,
    Newton–Schulz polar to orthonormalize). Intended as a hypothesis/refit
    candidate next to EPnP: MSAC consensus keeps whichever regime fits."""
    if w is None:
        w = jnp.ones(pts2d.shape[:-1], pts2d.dtype)
    from ..ops.smallmat import jacobi_eigh_small, chol_solve_small
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    c = jnp.sum(pts3d * w[..., None], axis=-2) / wsum            # (..., 3)
    rel = pts3d - c[..., None, :]
    cov = jnp.einsum('...ni,...nj->...ij', rel * w[..., None], rel)
    _, evec = jacobi_eigh_small(cov, sweeps=pca_sweeps)          # ascending
    b1 = evec[..., :, 2]                                         # in-plane
    b2 = evec[..., :, 1]
    q1 = jnp.sum(rel * b1[..., None, :], axis=-1)                # (..., N)
    q2 = jnp.sum(rel * b2[..., None, :], axis=-1)
    # normalize plane coords to unit RMS for conditioning
    qs = jnp.sqrt(jnp.maximum(jnp.sum((q1 * q1 + q2 * q2) * w, axis=-1,
                                      keepdims=True) / wsum / 2.0, 1e-12))
    q1n = q1 / qs
    q2n = q2 / qs

    inv_K = jnp.linalg.inv(cam_K)
    ones = jnp.ones_like(pts2d[..., :1])
    xy1 = jnp.concatenate((pts2d, ones), axis=-1)
    xy = rot_pts(xy1, inv_K)[..., :2]
    x = xy[..., 0]
    y = xy[..., 1]
    one = jnp.ones_like(q1n)
    zero = jnp.zeros_like(q1n)
    # rows for H (8 unknowns, H[2,2]=1): [q1 q2 1 0 0 0 -x q1 -x q2]·h = x
    ru = jnp.stack((q1n, q2n, one, zero, zero, zero, -x * q1n, -x * q2n), -1)
    rv = jnp.stack((zero, zero, zero, q1n, q2n, one, -y * q1n, -y * q2n), -1)
    A = jnp.concatenate((ru, rv), axis=-2)                       # (..., 2N, 8)
    b = jnp.concatenate((x, y), axis=-1)
    wr = jnp.concatenate((w, w), axis=-1)
    Aw = A * wr[..., None]
    AtA = jnp.sum(Aw[..., :, None] * A[..., None, :], axis=-3)
    AtA = AtA + 1e-8 * jnp.eye(8, dtype=A.dtype)
    Atb = jnp.sum(Aw * b[..., None], axis=-2)
    h, chol_ok = chol_solve_small(AtA, Atb)

    h1 = jnp.stack((h[..., 0], h[..., 3], h[..., 6]), -1)        # H col 0
    h2 = jnp.stack((h[..., 1], h[..., 4], h[..., 7]), -1)
    h3 = jnp.stack((h[..., 2], h[..., 5], jnp.ones_like(h[..., 0])), -1)
    # H = k·[qs·R_p e1, qs·R_p e2, T] with T the camera-frame plane centroid;
    # λ0 = 2/(‖h1‖+‖h2‖) = 1/(k·qs) recovers unit rotation columns, and
    # T = λ0·qs·h3. Cheirality is automatic: h3_z is pinned to 1 by the
    # inhomogeneous solve, so T_z = λ0·qs > 0.
    n1 = jnp.linalg.norm(h1, axis=-1)
    n2 = jnp.linalg.norm(h2, axis=-1)
    lam = 2.0 / jnp.maximum(n1 + n2, 1e-12)
    r1 = lam[..., None] * h1
    r2 = lam[..., None] * h2
    r3 = jnp.cross(r1, r2)
    R_raw = jnp.stack((r1, r2, r3), axis=-1)                     # cols
    R_p = _polar_rotation(R_raw)
    t_p = lam[..., None] * h3
    # back to world frame: X − c = Bf @ (q1, q2, 0)ᵀ
    Bf = jnp.stack((b1, b2, jnp.cross(b1, b2)), axis=-1)         # cols
    R_w = mm_small(R_p, jnp.swapaxes(Bf, -1, -2))
    t_w = t_p * qs - jnp.sum(R_w * c[..., None, :], axis=-1)
    ok = chol_ok & (_det3(R_w) > 0) & (t_w[..., 2] > 0)
    pose = jnp.concatenate((matrix_to_quaternion(R_w), t_w), axis=-1)
    finite = jnp.all(jnp.isfinite(pose), axis=-1)
    ok = ok & finite
    default = jnp.zeros_like(pose).at[..., 0].set(1.0).at[..., 6].set(1.0)
    return jnp.where(finite[..., None], pose, default), ok


def _planar_flip(pose7: jax.Array, pts3d: jax.Array, w: jax.Array
                 ) -> jax.Array:
    """The two-fold planar-pose ambiguity's OTHER solution (Schweighofer &
    Pinz): mirror the camera-frame plane normal across the viewing ray of the
    centroid and rotate the pose accordingly. For a (near-)planar support set
    both poses reproject almost identically under noise — proposing the flip
    as an MSAC candidate lets the slightly-better-fitting one win instead of
    whichever the homography decomposition happened to land on. Harmless for
    non-planar supports (the flip scores far worse and is rejected)."""
    from ..geom.rotations import quaternion_to_matrix, matrix_to_quaternion, \
        axis_angle_to_matrix
    from ..ops.smallmat import jacobi_eigh_small
    R = quaternion_to_matrix(pose7[..., :4])
    t = pose7[..., 4:7]
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    c = jnp.sum(pts3d * w[..., None], axis=-2) / wsum
    rel = pts3d - c[..., None, :]
    cov = jnp.einsum('...ni,...nj->...ij', rel * w[..., None], rel)
    _, evec = jacobi_eigh_small(cov)
    b3 = evec[..., :, 0]                                 # world plane normal
    n_c = jnp.sum(R * b3[..., None, :], axis=-1)         # R @ b3
    # viewing ray of the camera-frame centroid R c + t
    cc = jnp.sum(R * c[..., None, :], axis=-1) + t
    v = cc / jnp.maximum(jnp.linalg.norm(cc, axis=-1, keepdims=True), 1e-9)
    n2 = 2.0 * jnp.sum(v * n_c, axis=-1, keepdims=True) * v - n_c
    axis = jnp.cross(n_c, n2)
    s = jnp.linalg.norm(axis, axis=-1)
    ang = jnp.arctan2(s, jnp.sum(n_c * n2, axis=-1))
    aa = axis / jnp.maximum(s, 1e-9)[..., None] * ang[..., None]
    R2 = mm_small(axis_angle_to_matrix(aa), R)
    # the flip pivots the plane about its CAMERA-FRAME centroid cc, so t must
    # move with it: R2 @ c + t2 = cc  (keeping t unchanged rotates the pattern
    # about the camera origin instead — measured 27 px mean reprojection shift
    # on a 5x5 planar grid with a 50 mm model-frame centroid vs 0.8 px for the
    # centroid-anchored flip, i.e. a candidate MSAC could never accept)
    t2 = cc - jnp.sum(R2 * c[..., None, :], axis=-1)
    return jnp.concatenate((matrix_to_quaternion(R2), t2), axis=-1)


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
               num_hypotheses: int = 150, sample_size: int = 6,
               local_opt: bool = True,
               hyp_estimators: tuple = ('epnp', 'planar', 'dlt')
               ) -> RansacResult:
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

    # minimal-sample solvers: every sample is solved by THREE estimators with
    # complementary degeneracy regimes, all competing in one consensus pool —
    # (1) EPnP (OpenCV's SOLVEPNP_EPNP hypothesis estimator,
    # cv2_solver.py:72-75): best for well-spread 3D samples (its rigidity
    # constraints keep noise amplification low: best-consensus rotation error
    # 2.9° vs DLT's 38° at 4 px noise) but its 4-control-point frame collapses
    # on (near-)planar samples; (2) the planar homography solver: exact on
    # planar samples (routine: FPS keypoint grids on one face, flat objects)
    # but wrong for deep 3D; (3) the ridge DLT: noisy but degeneracy-free —
    # its minimum-norm solution covers the thin-slab middle ground where both
    # others fail (observed: a near-planar 6-subset with singular values
    # 77/49/5 where EPnP and the homography each scored 0 consensus and DLT
    # scored 69). MSAC consensus keeps whichever regime fits each instance.
    from .epnp import epnp
    cand_h = []
    # Scalar-struct solvers on TPU: statistically identical output to the
    # generic estimators in cheap hypothesis mode, but ~an order of magnitude
    # closer to the VPU roofline (no stacks/einsums/scatters — see
    # fast_minimal.py); the generic full-precision variants remain the LO
    # refit estimators below. On CPU the generic tensor form is kept: the
    # scalar-struct trace is thousands of straight-line HLO ops, which the
    # TPU compiler fuses in seconds but XLA:CPU's LLVM backend takes tens of
    # minutes to compile (same backend split as pnp.solver.lm_refine_auto).
    if jax.default_backend() == 'cpu':
        if 'epnp' in hyp_estimators:
            cand_h.append(epnp(cam_K[:, None], sub3d, sub2d,
                               gn_iters=4, eig_iters=3, cp_sweeps=4))
        if 'planar' in hyp_estimators:
            cand_h.append(planar_pnp(cam_K[:, None], sub3d, sub2d,
                                     pca_sweeps=4))
        if 'dlt' in hyp_estimators:
            cand_h.append(dlt_pnp(cam_K[:, None], sub3d, sub2d))
    else:
        from .fast_minimal import epnp6_fast, planar6_fast, dlt6_fast
        if 'epnp' in hyp_estimators:
            cand_h.append(epnp6_fast(cam_K, sub3d, sub2d,    # (B, K, 7), (B, K)
                                     gn_iters=4, eig_iters=3, pca_sweeps=4))
        if 'planar' in hyp_estimators:
            cand_h.append(planar6_fast(cam_K, sub3d, sub2d, pca_sweeps=4))
        if 'dlt' in hyp_estimators:
            cand_h.append(dlt6_fast(cam_K, sub3d, sub2d))
    pose_h = jnp.concatenate([c[0] for c in cand_h], axis=1)  # (B, nE·K, 7)
    ok_h = jnp.concatenate([c[1] for c in cand_h], axis=1)

    from ..geom.rotations import quaternion_to_matrix
    # winner selection scores every hypothesis on a ≤256-point subset: the
    # consensus count is a statistic, not an exact quantity — the subset
    # ranks hypotheses the same in distribution at 4× less HBM traffic over
    # the (B, 3K, N) error field, and the LO loop below re-derives the
    # winner's support at full resolution anyway. The subset is drawn evenly
    # from the VALID points (rank selection below): a blind stride keeps
    # padded/masked points, and an instance with few valid points (small
    # occluded object under point_select='mask') could end up ranked on a
    # handful of them while the rest of the subset is dead weight.
    k_sc = min(256, N)
    if k_sc < N:
        # sort-free rank selection (TPU sort over (B, N) is the expensive op
        # everywhere in this file): the j-th target is the (tgt_j+1)-th valid
        # point, found by counting how many prefix-sums fall below its rank —
        # one cumsum + a (B, k, N) compare-reduce, all VPU elementwise.
        cum = jnp.cumsum(valid.astype(jnp.int32), axis=1)          # (B, N)
        n_val = jnp.maximum(cum[:, -1], 1)
        tgt = (jnp.arange(k_sc)[None, :] * n_val[:, None]) // k_sc + 1
        sel = jnp.sum(cum[:, None, :] < tgt[..., None], axis=-1)   # (B, k)
        sel = jnp.minimum(sel, N - 1)           # all-invalid row: clamp
        p3_s = jnp.take_along_axis(pts3d, sel[..., None], axis=1)
        p2_s = jnp.take_along_axis(pts2d, sel[..., None], axis=1)
        v_s = jnp.take_along_axis(valid, sel, axis=1)
    else:
        p3_s, p2_s, v_s = pts3d, pts2d, valid
    R_h = quaternion_to_matrix(pose_h[..., :4])
    err = _reproj_err(R_h, pose_h[..., 4:7], cam_K[:, None], p3_s[:, None],
                      p2_s[:, None])                          # (B, 3K, N/s)
    inl = (err < thr[:, None, None]) & v_s[:, None, :]
    counts = jnp.where(ok_h, jnp.sum(inl, axis=-1), -1)       # (B, 3K)

    best = jnp.argmax(counts, axis=-1)                        # (B,)
    best_pose = jnp.take_along_axis(pose_h, best[:, None, None], axis=1)[:, 0]

    # iterative local optimization (LO-RANSAC): re-fit on the winning inlier
    # set with EPnP (OpenCV's final on-inliers estimator), then alternate
    # short unweighted Gauss-Newton refits with inlier recounts. The minimal
    # 6-point DLT hypotheses carry several px of noise-induced bias, so the
    # winning hypothesis's inlier set covers only ~half the true consensus
    # and is geometrically biased toward it — a single refit+polish converges
    # to that biased optimum (measured 2.0° median vs cv2's 0.26° at 1 px
    # noise). Each recount admits the points the improved model now explains;
    # the set reaches its fixed point in one round, two more confirm it
    # (measured 0.20° median post-loop, at/below cv2 on every
    # noise x outlier condition — tests/test_parity_ransac.py).
    from .solver import lm_refine_auto as lm_refine

    def msac_score(p7, mult=1.0):
        """Truncated-quadratic model score at the FINAL threshold (lower =
        better; MSAC scoring breaks count ties toward the tighter fit), plus
        the support mask at `mult`× the threshold (the fitting band)."""
        R = quaternion_to_matrix(p7[..., :4])
        e = _reproj_err(R, p7[..., 4:7], cam_K, pts3d, pts2d)
        e2 = jnp.minimum(jnp.square(e), jnp.square(thr[:, None]))
        e2 = jnp.where(valid, e2, 0.0)
        return jnp.sum(e2, axis=-1), (e < mult * thr[:, None]) & valid

    def finalize(pose):
        """Support/validity at the exact threshold; a batch row where every
        hypothesis degenerated can carry a non-finite pose — return a benign
        identity pose with invalid=True instead (the reference's cv2 wrapper
        returns a zero pose + invalid on solver failure,
        cv2_solver.py:76-80)."""
        _, best_inl = msac_score(pose, 1.0)
        n_inl = jnp.sum(best_inl, axis=-1)
        finite = jnp.all(jnp.isfinite(pose), axis=-1)
        default = jnp.zeros_like(pose).at[..., 0].set(1.0).at[..., 6].set(1.0)
        return RansacResult(pose7=jnp.where(finite[..., None], pose, default),
                            invalid=(n_inl < 4) | ~finite, inliers=best_inl,
                            n_inliers=n_inl)

    pose = best_pose
    score, cur_inl = msac_score(pose, 2.0)
    if not local_opt:   # benchmark split: hypotheses + winner selection only
        return finalize(pose)
    # threshold-annealed iterative LO (Lebeda-style m·θ shrink): round 1 fits
    # on a 2×-threshold band — at high noise the final band captures only a
    # biased sliver of the good points (3 px band at 4 px noise ≈ 24% of them)
    # and refits on it hill-climb a biased optimum; the wide band is ~3× the
    # sample and nearly unbiased. Round 2 tightens to the final threshold.
    for mult in (2.0, 1.0):
        if mult == 2.0:
            # refit candidates run only in the wide round — by the tightening
            # round the support set has reached its fixed point and the GN
            # polish below is what remains to win. Candidate A: EPnP refit on
            # the current support set (escapes the reprojection objective's
            # local minima — the two-fold PnP ambiguity traps pure descent:
            # measured a case where GN stalls 1.9° off while EPnP on the same
            # inliers is exact). A': the planar refit — planar supports where
            # EPnP's control frame is rank-deficient. A'': the ridge DLT for
            # the thin-slab middle ground. MSAC acceptance keeps whichever
            # actually fits.
            enough = jnp.sum(cur_inl, -1) >= sample_size
            w_inl = cur_inl.astype(jnp.float32)
            ok_all = jnp.ones(pose.shape[:-1], bool)
            for cand, ok_c in (epnp(cam_K, pts3d, pts2d, w_inl),
                               planar_pnp(cam_K, pts3d, pts2d, w_inl),
                               dlt_pnp(cam_K, pts3d, pts2d, w_inl),
                               (_planar_flip(pose, pts3d, w_inl), ok_all)):
                s_c, inl_c = msac_score(cand, mult)
                take = ok_c & enough & (s_c < score)
                pose = jnp.where(take[:, None], cand, pose)
                score = jnp.where(take, s_c, score)
                cur_inl = jnp.where(take[:, None], inl_c, cur_inl)
        # candidate B: short Gauss-Newton descent on the current support.
        # fallback_to_init=False: the 10-iteration budget is a polish, not a
        # Ceres solve — a problem still descending at the cap should ship its
        # last accepted (strictly cost-decreasing) iterate, not be reverted to
        # the start; the MSAC score below is the acceptance test.
        gn = lm_refine(pose, cam_K, pts3d, pts2d, jnp.ones_like(pts2d),
                       valid=cur_inl, max_iter=10, fallback_to_init=False)
        s_b, inl_b = msac_score(gn.pose7, mult)
        take_b = jnp.all(jnp.isfinite(gn.pose7), -1) & (s_b < score)
        pose = jnp.where(take_b[:, None], gn.pose7, pose)
        score = jnp.where(take_b, s_b, score)
        cur_inl = jnp.where(take_b[:, None], inl_b, cur_inl)

    return finalize(pose)
