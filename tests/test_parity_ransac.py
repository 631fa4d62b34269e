"""Head-to-head statistical parity of the RANSAC init vs cv2.solvePnPRansac.

The reference initializes inference-time PnP with OpenCV EPnP-RANSAC
(/root/reference/lib/pnp/cv2_solver.py:69-101, invoked test.py:115-120:
SOLVEPNP_EPNP, iterationsCount=150, confidence=0.99, reprojectionError=3).
`lc_tpu.pnp.ransac.ransac_pnp` replaces it with an on-device batched solver
whose RNG necessarily differs, so parity is statistical: on identical problem
sets spanning the production noise/outlier regimes, lc_tpu's pose-error
quantiles must be no worse than cv2's (within a stated margin), and the
post-LM-refine poses from either init must agree — the init only needs to land
in the same basin.

Problem geometry mirrors the production dense path: ~716 selected points from
a 64-grid object surface, LM-O-like intrinsics, objects 0.4-1.2 m away.
Margins recorded in PARITY.md.
"""
from __future__ import annotations

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as sciR

from lc_tpu.pnp.ransac import ransac_pnp
from lc_tpu.pnp.solver import lm_refine_auto as lm_refine

pytestmark = pytest.mark.slow  # the 216-problem cv2.solvePnPRansac head-to-head study

K = np.array([[572.4114, 0.0, 325.2611],
              [0.0, 573.57043, 242.04899],
              [0.0, 0.0, 1.0]], np.float32)
N_PTS = 716
REPROJ_THR = 3.0          # px, the reference's dense-path setting (test.py:115)


def _make_problems(n, noise_px, outlier_frac, seed):
    """n problems of N_PTS surface points; returns (pts3d, pts2d, R_gt, t_gt)."""
    rng = np.random.default_rng(seed)
    R_gt = sciR.random(n, random_state=seed).as_matrix().astype(np.float64)
    t_gt = np.concatenate([rng.uniform(-60, 60, (n, 2)),
                           rng.uniform(400, 1200, (n, 1))], -1)
    # object surface: points on a jittered box shell, ~60 mm extent (LM-O-ish)
    face = rng.integers(0, 3, (n, N_PTS))
    sign = rng.choice([-1.0, 1.0], (n, N_PTS))
    pts3d = rng.uniform(-40, 40, (n, N_PTS, 3))
    for ax in range(3):
        sel = face == ax
        pts3d[..., ax][sel] = (sign * 40.0)[sel] + rng.normal(0, 2, (n, N_PTS))[sel]
    cam = np.einsum('nij,npj->npi', R_gt, pts3d) + t_gt[:, None]
    uvw = np.einsum('ij,npj->npi', K.astype(np.float64), cam)
    uv = uvw[..., :2] / uvw[..., 2:3]
    uv_noisy = uv + rng.normal(0, noise_px, uv.shape)
    n_out = int(round(outlier_frac * N_PTS))
    if n_out:
        # outliers: uniform pixels within the projected bbox, inflated 1.5x —
        # mimics confidently-wrong correspondences inside the crop
        lo = uv.min(1, keepdims=True)
        hi = uv.max(1, keepdims=True)
        c = 0.5 * (lo + hi)
        half = 0.75 * (hi - lo)
        bad = rng.uniform(c - half, c + half, (n, n_out, 2))
        idx = np.stack([rng.permutation(N_PTS)[:n_out] for _ in range(n)])
        np.put_along_axis(uv_noisy, idx[..., None], bad, axis=1)
    return (pts3d.astype(np.float32), uv_noisy.astype(np.float32),
            R_gt.astype(np.float32), t_gt.astype(np.float32))


def _pose_errors(R_est, t_est, R_gt, t_gt):
    """(rotation deg, translation mm) per instance."""
    cos = 0.5 * (np.einsum('nij,nij->n', R_est, R_gt) - 1.0)
    rot = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))
    trans = np.linalg.norm(t_est - t_gt, axis=-1)
    return rot, trans


def _cv2_solve(pts3d, pts2d):
    """Reference path: cv2.solvePnPRansac EPnP, 150 iters (cv2_solver.py:72-75)."""
    Rs, ts, ok = [], [], []
    for X, x in zip(pts3d, pts2d):
        retval, rvec, tvec, inliers = cv2.solvePnPRansac(
            X.astype(np.float64), x.astype(np.float64), K.astype(np.float64),
            None, flags=cv2.SOLVEPNP_EPNP, confidence=0.99,
            iterationsCount=150, reprojectionError=REPROJ_THR)
        ok.append(bool(retval))
        if retval:
            Rs.append(cv2.Rodrigues(rvec)[0])
            ts.append(tvec[:, 0])
        else:
            Rs.append(np.eye(3))
            ts.append(np.zeros(3))
    return np.asarray(Rs, np.float32), np.asarray(ts, np.float32), np.asarray(ok)


def _ours_solve(pts3d, pts2d, seed=0):
    Ks = jnp.broadcast_to(jnp.asarray(K), (len(pts3d), 3, 3))
    rr = ransac_pnp(Ks, jnp.asarray(pts3d), jnp.asarray(pts2d),
                    jax.random.PRNGKey(seed), reproj_threshold=REPROJ_THR)
    from lc_tpu.geom.pose import pose7_to_RT
    R, t = pose7_to_RT(rr.pose7)
    return np.asarray(R), np.asarray(t), ~np.asarray(rr.invalid)


CONDITIONS = [(s, f) for s in (1.0, 2.0, 4.0) for f in (0.0, 0.2, 0.4)]


class TestRansacVsCv2:
    @pytest.mark.parametrize('noise_px,outlier_frac', CONDITIONS)
    def test_error_quantiles_not_worse(self, noise_px, outlier_frac):
        n = 24  # x9 conditions = 216 problems total
        pts3d, pts2d, R_gt, t_gt = _make_problems(
            n, noise_px, outlier_frac, seed=int(noise_px * 10 + outlier_frac * 100))
        cR, ct, cok = _cv2_solve(pts3d, pts2d)
        oR, ot, ook = _ours_solve(pts3d, pts2d)
        assert ook.mean() >= cok.mean() - 1e-9  # at least as many valid solves
        c_rot, c_tr = _pose_errors(cR, ct, R_gt, t_gt)
        o_rot, o_tr = _pose_errors(oR, ot, R_gt, t_gt)
        # invalid solves count as failures at +inf for both sides
        c_rot = np.where(cok, c_rot, np.inf)
        c_tr = np.where(cok, c_tr, np.inf)
        o_rot = np.where(ook, o_rot, np.inf)
        o_tr = np.where(ook, o_tr, np.inf)
        # margins (PARITY.md): median within 1.5x + 0.1 abs; p90 within 2x + 0.2
        for q, mul, add in ((50, 1.5, 0.1), (90, 2.0, 0.2)):
            assert np.percentile(o_rot, q) <= mul * np.percentile(c_rot, q) + add, \
                (noise_px, outlier_frac, q, np.percentile(o_rot, q),
                 np.percentile(c_rot, q))
            assert np.percentile(o_tr, q) <= mul * np.percentile(c_tr, q) + add * 10, \
                (noise_px, outlier_frac, q, np.percentile(o_tr, q),
                 np.percentile(c_tr, q))

    def test_inlier_behavior(self):
        """Inlier counts on a clean-vs-contaminated problem must track cv2's:
        both solvers should flag ~the same fraction of points as inliers."""
        n = 16
        pts3d, pts2d, R_gt, t_gt = _make_problems(n, 2.0, 0.3, seed=77)
        cv2_counts = []
        for X, x in zip(pts3d, pts2d):
            retval, _, _, inliers = cv2.solvePnPRansac(
                X.astype(np.float64), x.astype(np.float64), K.astype(np.float64),
                None, flags=cv2.SOLVEPNP_EPNP, confidence=0.99,
                iterationsCount=150, reprojectionError=REPROJ_THR)
            cv2_counts.append(0 if not retval else len(inliers))
        Ks = jnp.broadcast_to(jnp.asarray(K), (n, 3, 3))
        rr = ransac_pnp(Ks, jnp.asarray(pts3d), jnp.asarray(pts2d),
                        jax.random.PRNGKey(3), reproj_threshold=REPROJ_THR)
        ours = np.asarray(rr.n_inliers)
        cv2_counts = np.asarray(cv2_counts)
        # anchor: the GT pose's own consensus size — the most any correct
        # model can explain (± threshold-boundary points)
        from lc_tpu.pnp.ransac import _reproj_err
        gt_err = np.asarray(_reproj_err(jnp.asarray(R_gt), jnp.asarray(t_gt),
                                        Ks, jnp.asarray(pts3d),
                                        jnp.asarray(pts2d)))
        true_counts = (gt_err < REPROJ_THR).sum(-1)
        # per-instance: at least cv2's support (minus boundary slack), never
        # meaningfully beyond the true consensus (that would mean the model
        # is bending to explain outliers)
        assert np.all(ours >= cv2_counts - 0.05 * N_PTS), \
            list(zip(ours.tolist(), cv2_counts.tolist()))
        assert np.all(ours <= true_counts + 0.05 * N_PTS), \
            list(zip(ours.tolist(), true_counts.tolist()))

    def test_post_refine_agreement(self):
        """Either init must land the LM refine in the same basin: refined poses
        from the cv2 start and the lc_tpu start agree to sub-degree/sub-mm."""
        n = 16
        pts3d, pts2d, R_gt, t_gt = _make_problems(n, 2.0, 0.2, seed=5)
        cR, ct, cok = _cv2_solve(pts3d, pts2d)
        oR, ot, ook = _ours_solve(pts3d, pts2d)
        assert cok.all() and ook.all()

        from lc_tpu.geom.pose import RT_to_pose7, pose7_to_RT
        from lc_tpu.pnp.ransac import _reproj_err
        Ks = jnp.broadcast_to(jnp.asarray(K), (n, 3, 3))
        # refine BOTH inits against one common support set (cv2's inliers):
        # identical objective, so any disagreement is a genuine different-basin
        # failure, not a support-set boundary difference
        common_inl = _reproj_err(jnp.asarray(cR), jnp.asarray(ct), Ks,
                                 jnp.asarray(pts3d),
                                 jnp.asarray(pts2d)) < REPROJ_THR

        def refine(R0, t0):
            pose0 = RT_to_pose7(jnp.asarray(R0), jnp.asarray(t0))
            res = lm_refine(pose0, Ks, jnp.asarray(pts3d), jnp.asarray(pts2d),
                            jnp.ones_like(jnp.asarray(pts2d)),
                            valid=common_inl, max_iter=50)
            assert not np.asarray(res.invalid).any()
            return pose7_to_RT(res.pose7)
        R_a, t_a = refine(cR, ct)
        R_b, t_b = refine(oR, ot)
        rot_diff, tr_diff = _pose_errors(np.asarray(R_a), np.asarray(t_a),
                                         np.asarray(R_b), np.asarray(t_b))
        assert np.max(rot_diff) < 0.1, rot_diff
        assert np.max(tr_diff) < 0.5, tr_diff
