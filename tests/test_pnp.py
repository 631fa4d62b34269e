import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as sciR

from lc_tpu import geom, pnp

RNG = np.random.default_rng(42)
K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32)


def make_problem(n_pts=64, batch=4, seed=0, z=600.0):
    rng = np.random.default_rng(seed)
    Rs = sciR.random(batch, random_state=seed).as_matrix().astype(np.float32)
    ts = np.concatenate(
        (rng.uniform(-50, 50, (batch, 2)), rng.uniform(z, z + 200, (batch, 1))),
        axis=-1).astype(np.float32)
    pts3d = rng.uniform(-40, 40, (batch, n_pts, 3)).astype(np.float32)
    Ks = np.broadcast_to(K, (batch, 3, 3))
    pose = np.asarray(geom.RT_to_pose7(jnp.asarray(Rs), jnp.asarray(ts)))
    uv = np.asarray(geom.project_apply(jnp.asarray(Ks), jnp.asarray(pts3d),
                                       jnp.asarray(Rs), jnp.asarray(ts)))
    return pose, Ks, pts3d, uv


class TestResidual:
    def test_zero_residual_at_gt(self):
        pose, Ks, pts3d, uv = make_problem()
        r, J = pnp.residual_with_jac6d(jnp.asarray(pose), jnp.asarray(Ks),
                                       jnp.asarray(pts3d), jnp.asarray(uv))
        assert np.abs(np.asarray(r)).max() < 1e-2  # sub-centipixel at f≈570

    def test_jacobian_matches_autodiff(self):
        pose, Ks, pts3d, uv = make_problem(n_pts=8, batch=2)

        def res_of_delta(delta, p, k, x3, x2):
            return pnp.residual_with_jac6d(
                geom.apply_perturb(p, delta), k, x3, x2)[0]

        J_auto = jax.vmap(
            lambda p, k, x3, x2: jax.jacfwd(res_of_delta)(
                jnp.zeros(6), p, k, x3, x2)
        )(jnp.asarray(pose), jnp.asarray(Ks), jnp.asarray(pts3d), jnp.asarray(uv))
        _, J = pnp.residual_with_jac6d(jnp.asarray(pose), jnp.asarray(Ks),
                                       jnp.asarray(pts3d), jnp.asarray(uv))
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto),
                                   rtol=1e-3, atol=1e-3)


class TestLM:
    def test_recovers_pose_from_noiseless(self):
        pose, Ks, pts3d, uv = make_problem(batch=8)
        # perturb the start: a few degrees + translation error
        d = RNG.normal(size=(8, 6)).astype(np.float32) * np.array(
            [0.05, 0.05, 0.05, 10, 10, 20], np.float32)
        start = np.asarray(geom.apply_perturb(jnp.asarray(pose), jnp.asarray(d)))
        w = jnp.ones((8, 64, 2))
        res = pnp.lm_refine(jnp.asarray(start), jnp.asarray(Ks),
                            jnp.asarray(pts3d), jnp.asarray(uv), w)
        assert not np.any(np.asarray(res.invalid))
        np.testing.assert_allclose(np.asarray(res.pose7[:, 4:]), pose[:, 4:],
                                   atol=0.05)
        dot = np.abs(np.sum(np.asarray(res.pose7[:, :4]) * pose[:, :4], axis=-1))
        assert np.all(dot > 1.0 - 5e-6)  # ≲0.2°; LM stops at function_tolerance

    def test_weighted_downweights_noisy_points(self):
        pose, Ks, pts3d, uv = make_problem(batch=4, n_pts=128)
        noisy = uv.copy()
        noisy[:, :64] += RNG.normal(size=(4, 64, 2)).astype(np.float32) * 8.0
        noisy[:, 64:] += RNG.normal(size=(4, 64, 2)).astype(np.float32) * 0.05
        w = np.zeros((4, 128, 2), np.float32)
        w[:, :64] = 1.0 / 64.0
        w[:, 64:] = 1.0 / 0.0025
        d = RNG.normal(size=(4, 6)).astype(np.float32) * np.array(
            [0.02, 0.02, 0.02, 5, 5, 10], np.float32)
        start = np.asarray(geom.apply_perturb(jnp.asarray(pose), jnp.asarray(d)))

        res_w = pnp.lm_refine(jnp.asarray(start), jnp.asarray(Ks),
                              jnp.asarray(pts3d), jnp.asarray(noisy), jnp.asarray(w))
        res_u = pnp.lm_refine(jnp.asarray(start), jnp.asarray(Ks),
                              jnp.asarray(pts3d), jnp.asarray(noisy),
                              jnp.ones((4, 128, 2)))
        err_w = np.linalg.norm(np.asarray(res_w.pose7[:, 4:]) - pose[:, 4:], axis=-1)
        err_u = np.linalg.norm(np.asarray(res_u.pose7[:, 4:]) - pose[:, 4:], axis=-1)
        assert err_w.mean() < err_u.mean()

    def test_too_few_points_invalid_and_falls_back(self):
        pose, Ks, pts3d, uv = make_problem(batch=2, n_pts=16)
        valid = np.zeros((2, 16), bool)
        valid[0, :8] = True
        valid[1, :2] = True  # < 3 points
        start = pose.copy()
        start[:, 4] += 30.0
        res = pnp.lm_refine(jnp.asarray(start), jnp.asarray(Ks),
                            jnp.asarray(pts3d), jnp.asarray(uv),
                            jnp.ones((2, 16, 2)), valid=jnp.asarray(valid))
        assert not np.asarray(res.invalid)[0]
        assert np.asarray(res.invalid)[1]
        np.testing.assert_allclose(np.asarray(res.pose7)[1], start[1])

    def test_jit_compiles_once(self):
        pose, Ks, pts3d, uv = make_problem(batch=4)
        f = jax.jit(pnp.lm_refine)
        out = f(jnp.asarray(pose), jnp.asarray(Ks), jnp.asarray(pts3d),
                jnp.asarray(uv), jnp.ones((4, 64, 2)))
        assert out.pose7.shape == (4, 7)


class TestRansac:
    def test_recovers_pose_with_outliers(self):
        pose, Ks, pts3d, uv = make_problem(batch=4, n_pts=128, seed=3)
        corrupted = uv.copy()
        out_idx = RNG.choice(128, 50, replace=False)
        corrupted[:, out_idx] = RNG.uniform(0, 640, size=(4, 50, 2)).astype(np.float32)
        res = pnp.ransac_pnp(jnp.asarray(Ks), jnp.asarray(pts3d),
                             jnp.asarray(corrupted), jax.random.PRNGKey(0),
                             reproj_threshold=3.0)
        assert not np.any(np.asarray(res.invalid))
        assert np.all(np.asarray(res.n_inliers) >= 70)
        np.testing.assert_allclose(np.asarray(res.pose7[:, 4:]), pose[:, 4:],
                                   atol=2.0)
        dot = np.abs(np.sum(np.asarray(res.pose7[:, :4]) * pose[:, :4], axis=-1))
        assert np.all(dot > 0.9999)

    def test_planar_flip_is_competitive_candidate(self):
        """The planar-ambiguity flip must pivot the plane about its
        CAMERA-FRAME centroid: the flipped pose reprojects the planar pattern
        within ~a pixel of the original (that's what makes the two branches
        ambiguous) while its rotation differs by tens of degrees. A flip that
        keeps t while rotating R about the camera origin shifts the pattern
        tens of pixels and can never win MSAC (regression: measured 27 px)."""
        from scipy.spatial.transform import Rotation as sciR
        from lc_tpu.pnp.ransac import _planar_flip, _reproj_err
        from lc_tpu.geom.pose import pose7_to_RT, RT_to_pose7
        g = np.stack(np.meshgrid(np.linspace(-30, 30, 5),
                                 np.linspace(-20, 20, 5)), -1).reshape(-1, 2)
        pts3d = np.concatenate([g, np.full((25, 1), 50.0)],
                               -1).astype(np.float32)[None]
        R = sciR.from_euler('xyz', [15, 8, 3],
                            degrees=True).as_matrix().astype(np.float32)[None]
        t = np.array([[10.0, -5.0, 600.0]], np.float32)
        K = np.array([[[600.0, 0, 320], [0, 600, 240], [0, 0, 1]]], np.float32)
        cam = np.einsum('bij,bnj->bni', R, pts3d) + t[:, None]
        uvw = np.einsum('bij,bnj->bni', K, cam)
        uv = (uvw[..., :2] / uvw[..., 2:]).astype(np.float32)
        pose = RT_to_pose7(jnp.asarray(R), jnp.asarray(t))
        flip = _planar_flip(pose, jnp.asarray(pts3d),
                            jnp.ones((1, 25), jnp.float32))
        Rf, tf = pose7_to_RT(flip)
        err = _reproj_err(Rf, tf, jnp.asarray(K), jnp.asarray(pts3d),
                          jnp.asarray(uv))
        assert float(jnp.mean(err)) < 1.5, float(jnp.mean(err))
        cos = 0.5 * (np.trace(np.asarray(Rf)[0].T @ R[0]) - 1.0)
        ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        assert ang > 10.0, ang   # genuinely the other ambiguity branch

    @pytest.mark.slow  # 46s; test_recovers_pose_with_outliers stays the quick RANSAC guard
    def test_inlier_mask_excludes_outliers(self):
        pose, Ks, pts3d, uv = make_problem(batch=1, n_pts=64, seed=5)
        corrupted = uv.copy()
        corrupted[:, :20] += 80.0
        res = pnp.ransac_pnp(jnp.asarray(Ks), jnp.asarray(pts3d),
                             jnp.asarray(corrupted), jax.random.PRNGKey(1))
        inl = np.asarray(res.inliers[0])
        assert inl[:20].sum() == 0
        assert inl[20:].sum() >= 40

    def test_dlt_exact(self):
        pose, Ks, pts3d, uv = make_problem(batch=4, n_pts=12, seed=7)
        p7, ok = pnp.dlt_pnp(jnp.asarray(Ks), jnp.asarray(pts3d), jnp.asarray(uv))
        assert np.all(np.asarray(ok))
        np.testing.assert_allclose(np.asarray(p7[:, 4:]), pose[:, 4:], atol=1.0)


class TestCovariance:
    def _setup(self, batch=2, n=32, seed=9):
        pose, Ks, pts3d, uv = make_problem(batch=batch, n_pts=n, seed=seed)
        w = RNG.uniform(0.5, 2.0, size=(batch, n, 2)).astype(np.float32)
        return (jnp.asarray(pose), jnp.asarray(Ks), jnp.asarray(pts3d),
                jnp.asarray(uv), jnp.asarray(w))

    @pytest.mark.slow  # 29s FD study; test_differentiable_wrt_weights is the quick covariance guard
    def test_jacobian_vs_lm_resolve_fd(self):
        """∂update/∂pts2d from the closed form must match finite differences of the
        actual weighted LM solution. Runs in f64: in f32 the LM's convergence
        noise floor is on the order of the finite differences themselves."""
        jax.config.update('jax_enable_x64', True)
        try:
            pose, Ks, pts3d, uv, w = [
                jnp.asarray(np.asarray(a), jnp.float64)
                for a in self._setup(batch=1)]
            out = pnp.weighted_pnp_jac_cov(pose, Ks, pts3d, uv, w)
            assert not np.asarray(out.invalid)[0]

            def solve_local(uv_pert):
                res = pnp.lm_refine(pose, Ks, pts3d, uv_pert, w,
                                    function_tolerance=1e-14, max_iter=200)
                # local coordinates of solution relative to GT pose
                dq = geom.quaternion_raw_multiply(
                    geom.quaternion_invert(pose[..., :4]), res.pose7[..., :4])
                aa = geom.quaternion_to_axis_angle(dq)
                dt = res.pose7[..., 4:] - pose[..., 4:]
                return jnp.concatenate((aa, dt), axis=-1)[0]

            eps = 0.05
            for (n_i, c_i) in [(0, 0), (5, 1), (17, 0)]:
                duv = np.zeros_like(np.asarray(uv))
                duv[0, n_i, c_i] = eps
                plus = np.asarray(solve_local(uv + duv))
                minus = np.asarray(solve_local(uv - duv))
                fd = (plus - minus) / (2 * eps)
                np.testing.assert_allclose(
                    np.asarray(out.jac[0, :, n_i, c_i]), fd,
                    rtol=0.05, atol=2e-4)
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_cov_is_inverse_hessian(self):
        pose, Ks, pts3d, uv, w = self._setup()
        out = pnp.weighted_pnp_jac_cov(pose, Ks, pts3d, uv, w)
        _, J = pnp.residual_with_jac6d(pose, Ks, pts3d, uv)
        H = np.einsum('bnci,bncj,bnc->bij', np.asarray(J), np.asarray(J),
                      np.asarray(w))
        np.testing.assert_allclose(np.asarray(out.cov) @ H,
                                   np.broadcast_to(np.eye(6), (2, 6, 6)), atol=1e-2)

    def test_differentiable_wrt_weights(self):
        """FD check runs in f64 — in f32 the central difference of this large
        objective is pure rounding noise (verified: f64 FD matches autodiff to
        8 digits)."""
        pose, Ks, pts3d, uv, w = self._setup(batch=1)
        jax.config.update('jax_enable_x64', True)
        try:
            args = [jnp.asarray(np.asarray(a), jnp.float64)
                    for a in (pose, Ks, pts3d, uv, w)]
            pose64, Ks64, pts3d64, uv64, w64 = args

            def f(weights):
                out = pnp.weighted_pnp_jac_cov(pose64, Ks64, pts3d64, uv64,
                                               weights)
                return jnp.sum(out.cov ** 2) + jnp.sum(out.jac ** 2)

            g = jax.grad(f)(w64)
            assert np.all(np.isfinite(np.asarray(g)))
            eps = 1e-4
            dw = np.zeros(np.asarray(w).shape)
            dw[0, 3, 1] = eps
            fd = (float(f(w64 + dw)) - float(f(w64 - dw))) / (2 * eps)
            np.testing.assert_allclose(float(np.asarray(g)[0, 3, 1]), fd,
                                       rtol=1e-4)
        finally:
            jax.config.update('jax_enable_x64', False)

    def test_safe_cholesky_flags_nonspd(self):
        good = jnp.eye(6)[None] * 2.0
        bad = -jnp.eye(6)[None]
        L, inv = pnp.safe_cholesky(jnp.concatenate((good, bad)))
        assert not np.asarray(inv)[0] and np.asarray(inv)[1]
        assert np.all(np.isfinite(np.asarray(L)))

    def test_pnp_update_backward_is_neg_chosolve(self):
        H = np.eye(6, dtype=np.float32) * 4.0
        L = jnp.asarray(np.linalg.cholesky(H))
        jtr = jnp.ones((6, 1))
        _, vjp = jax.vjp(lambda j: pnp.pnp_update(L, j), jtr)
        g = jnp.arange(1.0, 7.0)
        (cot,) = vjp(g)
        np.testing.assert_allclose(np.asarray(cot)[:, 0],
                                   -np.asarray(g) / 4.0, rtol=1e-5)


class TestEPnP:
    def test_recovers_pose_noiseless(self):
        from lc_tpu.pnp.epnp import epnp
        pose, Ks, pts3d, uv = make_problem(batch=4, n_pts=32, seed=13)
        p7, ok = epnp(jnp.asarray(Ks), jnp.asarray(pts3d), jnp.asarray(uv))
        assert np.all(np.asarray(ok))
        np.testing.assert_allclose(np.asarray(p7[:, 4:]), pose[:, 4:], atol=1.0)
        dot = np.abs(np.sum(np.asarray(p7[:, :4]) * pose[:, :4], axis=-1))
        assert np.all(dot > 0.9999)

    def test_weighted_mask(self):
        """Masked-out garbage points must not affect the solution."""
        from lc_tpu.pnp.epnp import epnp
        pose, Ks, pts3d, uv = make_problem(batch=2, n_pts=48, seed=17)
        uv2 = uv.copy()
        uv2[:, :16] += 200.0
        w = np.ones((2, 48), np.float32)
        w[:, :16] = 0.0
        p7, ok = epnp(jnp.asarray(Ks), jnp.asarray(pts3d), jnp.asarray(uv2),
                      jnp.asarray(w))
        assert np.all(np.asarray(ok))
        np.testing.assert_allclose(np.asarray(p7[:, 4:]), pose[:, 4:], atol=1.5)


class TestFastMinimal:
    """epnp6_fast (scalar-struct hypothesis solver) vs the generic epnp in its
    cheap hypothesis mode: statistically identical output, zero stacks."""

    def _problems(self, noise):
        rng = np.random.default_rng(0)
        B, Kh = 8, 50
        Kc = np.broadcast_to(K, (B, 3, 3)).copy()
        Rs = sciR.random(B * Kh, random_state=1).as_matrix().astype(
            np.float32).reshape(B, Kh, 3, 3)
        ts = np.concatenate((rng.uniform(-5, 5, (B, Kh, 2)),
                             rng.uniform(400, 600, (B, Kh, 1))),
                            -1).astype(np.float32)
        P3 = rng.uniform(-50, 50, (B, Kh, 6, 3)).astype(np.float32)
        cam = np.einsum('bkij,bknj->bkni', Rs, P3) + ts[:, :, None]
        uvw = np.einsum('bij,bknj->bkni', Kc, cam)
        uv = (uvw[..., :2] / uvw[..., 2:3]
              + rng.normal(0, noise, uvw[..., :2].shape)).astype(np.float32)
        return Kc, P3, uv, ts

    @pytest.mark.slow  # 26s; test_tpu_dispatch_branch is the quick fast_minimal guard
    def test_matches_generic_cheap_mode(self):
        from lc_tpu.pnp.epnp import epnp
        from lc_tpu.pnp.fast_minimal import epnp6_fast
        Kc, P3, uv, ts = self._problems(noise=1.0)
        pg, okg = epnp(jnp.asarray(Kc)[:, None], jnp.asarray(P3),
                       jnp.asarray(uv), gn_iters=4, eig_iters=3, cp_sweeps=4)
        pf, okf = epnp6_fast(jnp.asarray(Kc), jnp.asarray(P3), jnp.asarray(uv),
                             gn_iters=4, eig_iters=3, pca_sweeps=4)
        okg, okf = np.asarray(okg), np.asarray(okf)
        np.testing.assert_array_equal(okg, okf)
        both = okg & okf
        dt = np.linalg.norm(np.asarray(pg)[..., 4:] - np.asarray(pf)[..., 4:],
                            axis=-1)[both]
        # identical up to float ordering on the bulk; near-degenerate samples
        # may take different (equally valid) branches — bound the bulk tightly
        assert np.median(dt) < 0.1, np.median(dt)
        assert np.percentile(dt, 90) < 5.0, np.percentile(dt, 90)

    def test_noiseless_tail_matches(self):
        # the cheap mode's known noiseless failure tail (N=1-beta + GN on
        # near-degenerate samples) must be THE SAME tail, not a worse one
        from lc_tpu.pnp.epnp import epnp
        from lc_tpu.pnp.fast_minimal import epnp6_fast
        Kc, P3, uv, ts = self._problems(noise=0.0)
        pg, okg = epnp(jnp.asarray(Kc)[:, None], jnp.asarray(P3),
                       jnp.asarray(uv), gn_iters=4, eig_iters=3, cp_sweeps=4)
        pf, okf = epnp6_fast(jnp.asarray(Kc), jnp.asarray(P3), jnp.asarray(uv))

        def terr(p, ok):
            t = np.asarray(p)[..., 4:]
            return np.linalg.norm(t - ts, axis=-1)[np.asarray(ok)]
        eg, ef = terr(pg, okg), terr(pf, okf)
        assert np.median(ef) < 0.01
        assert np.percentile(ef, 99) <= np.percentile(eg, 99) * 1.05 + 0.1

    def _planar_problems(self, noise):
        """6-point samples drawn ON a random plane per hypothesis."""
        rng = np.random.default_rng(3)
        B, Kh = 8, 50
        Kc = np.broadcast_to(K, (B, 3, 3)).copy()
        Rs = sciR.random(B * Kh, random_state=4).as_matrix().astype(
            np.float32).reshape(B, Kh, 3, 3)
        ts = np.concatenate((rng.uniform(-5, 5, (B, Kh, 2)),
                             rng.uniform(400, 600, (B, Kh, 1))),
                            -1).astype(np.float32)
        frames = sciR.random(B * Kh, random_state=5).as_matrix().astype(
            np.float32).reshape(B, Kh, 3, 3)
        ab = rng.uniform(-50, 50, (B, Kh, 6, 2)).astype(np.float32)
        P3 = (ab[..., :1] * frames[:, :, None, :, 0]
              + ab[..., 1:2] * frames[:, :, None, :, 1])
        cam = np.einsum('bkij,bknj->bkni', Rs, P3) + ts[:, :, None]
        uvw = np.einsum('bij,bknj->bkni', Kc, cam)
        uv = (uvw[..., :2] / uvw[..., 2:3]
              + rng.normal(0, noise, uvw[..., :2].shape)).astype(np.float32)
        return Kc, P3, uv, ts

    def _pin(self, pg, okg, pf, okf):
        """Layout-parity assertion: ok flags agree on the bulk, and poses of
        jointly-valid samples differ only by float-ordering noise (the same
        median/p90 bounds as the epnp pin; near-degenerate samples may take
        different, equally valid branches)."""
        okg, okf = np.asarray(okg), np.asarray(okf)
        assert np.mean(okg != okf) < 0.01, np.mean(okg != okf)
        both = okg & okf
        assert both.mean() > 0.7   # the estimators legitimately reject some
        # noisy minimal samples (cheirality/det gates) — just not most of them
        dt = np.linalg.norm(np.asarray(pg)[..., 4:] - np.asarray(pf)[..., 4:],
                            axis=-1)[both]
        assert np.median(dt) < 0.1, np.median(dt)
        assert np.percentile(dt, 90) < 5.0, np.percentile(dt, 90)

    def test_dlt_matches_generic(self):
        # dlt6_fast is a PRODUCTION hypothesis estimator on TPU (the generic
        # dlt_pnp runs only on the CPU branch) — pin the scalar-struct layout
        # to the tensor form the parity suite exercises
        from lc_tpu.pnp.fast_minimal import dlt6_fast
        from lc_tpu.pnp.ransac import dlt_pnp
        Kc, P3, uv, ts = self._problems(noise=1.0)
        pg, okg = dlt_pnp(jnp.asarray(Kc)[:, None], jnp.asarray(P3),
                          jnp.asarray(uv))
        pf, okf = dlt6_fast(jnp.asarray(Kc), jnp.asarray(P3), jnp.asarray(uv))
        self._pin(pg, okg, pf, okf)

    def test_planar_matches_generic(self):
        from lc_tpu.pnp.fast_minimal import planar6_fast
        from lc_tpu.pnp.ransac import planar_pnp
        Kc, P3, uv, ts = self._planar_problems(noise=1.0)
        pg, okg = planar_pnp(jnp.asarray(Kc)[:, None], jnp.asarray(P3),
                             jnp.asarray(uv), pca_sweeps=4)
        pf, okf = planar6_fast(jnp.asarray(Kc), jnp.asarray(P3),
                               jnp.asarray(uv), pca_sweeps=4)
        self._pin(pg, okg, pf, okf)

    def test_tpu_dispatch_branch(self, monkeypatch):
        # force the TPU estimator branch of ransac_pnp on this CPU backend:
        # the dispatch glue (fast-solver calls, candidate concat order, ok
        # masks) is otherwise never executed by the CPU-forced suite
        import lc_tpu.pnp.ransac as rmod
        monkeypatch.setattr(rmod.jax, 'default_backend', lambda: 'tpu')
        pose, Ks, pts3d, uv = make_problem(n_pts=48, batch=2, seed=11)
        res = rmod.ransac_pnp(jnp.asarray(Ks), jnp.asarray(pts3d),
                              jnp.asarray(uv), jax.random.PRNGKey(0),
                              num_hypotheses=8, local_opt=False)
        assert not np.asarray(res.invalid).any()
        terr = np.linalg.norm(np.asarray(res.pose7)[:, 4:] - pose[:, 4:],
                              axis=-1)
        q = np.asarray(res.pose7)[:, :4]
        dot = np.abs(np.sum(q * pose[:, :4], axis=-1))
        # noiseless, outlier-free: the best minimal-sample solution is the
        # true pose up to cheap-mode solver precision
        assert terr.max() < 5.0, terr
        assert dot.min() > 0.999, dot


class TestSmallEigh:
    """The unrolled Jacobi eigh + inverse subspace iteration that replace
    jnp.linalg.eigh inside EPnP (its loop-based TPU kernel dominated the whole
    solve and its remote compile took minutes)."""

    @pytest.mark.slow  # 21s; test_small_gap is the quick small-eigh guard
    def test_jacobi_matches_numpy(self):
        from lc_tpu.ops.smallmat import jacobi_eigh_small
        rng = np.random.default_rng(3)
        for n in (3, 4, 6):
            A = rng.normal(size=(7, n, n))
            A = A + A.transpose(0, 2, 1)
            v_np, V_np = np.linalg.eigh(A)
            v_j, V_j = jax.jit(jacobi_eigh_small)(jnp.asarray(A))
            np.testing.assert_allclose(np.asarray(v_j), v_np, atol=1e-5)
            # eigenvectors match up to sign
            dots = np.abs(np.einsum('bij,bij->bj', np.asarray(V_j), V_np))
            assert dots.min() > 1 - 1e-5

    @pytest.mark.slow  # 24s; test_small_gap is the quick small-eigh guard
    def test_smallest_eigvecs_subspace(self):
        from lc_tpu.ops.smallmat import smallest_eigvecs
        rng = np.random.default_rng(4)
        B, n = 6, 12
        Q = np.linalg.qr(rng.normal(size=(B, n, n)))[0]
        lam = np.concatenate([rng.uniform(1e-6, 1e-3, (B, 4)),
                              rng.uniform(1.0, 10.0, (B, 8))], -1)
        A = np.einsum('bij,bj,bkj->bik', Q, lam, Q)
        V, w = jax.jit(lambda a: smallest_eigvecs(a, 4))(jnp.asarray(A))
        order = np.argsort(lam, -1)[:, :4]
        Vt = np.stack([Q[b][:, order[b]] for b in range(B)])
        sv = np.linalg.svd(np.einsum('bij,bik->bjk', Vt, np.asarray(V)),
                           compute_uv=False)
        assert sv.min() > 1 - 1e-5  # principal angles ~0: same subspace

    def test_small_gap(self):
        # near-degenerate spectra (small lambda_4/lambda_5 gap, e.g. near-planar
        # EPnP point sets): 6 inverse iterations must still isolate the subspace
        # for a 2x gap (advisor round-2 finding; was 3 iterations)
        from lc_tpu.ops.smallmat import smallest_eigvecs
        rng = np.random.default_rng(5)
        B, n = 6, 12
        Q = np.linalg.qr(rng.normal(size=(B, n, n)))[0]
        # lambda_4 = 0.5, lambda_5 = 1.0 — only a 2x gap
        lam = np.concatenate([rng.uniform(1e-4, 0.5, (B, 3)),
                              np.full((B, 1), 0.5),
                              np.full((B, 1), 1.0),
                              rng.uniform(1.0, 10.0, (B, 7))], -1)
        A = np.einsum('bij,bj,bkj->bik', Q, lam, Q)
        V, w = jax.jit(lambda a: smallest_eigvecs(a, 4))(jnp.asarray(A))
        order = np.argsort(lam, -1)[:, :4]
        Vt = np.stack([Q[b][:, order[b]] for b in range(B)])
        sv = np.linalg.svd(np.einsum('bij,bik->bjk', Vt, np.asarray(V)),
                           compute_uv=False)
        # (1/2)^6 contamination pre-Rayleigh-Ritz => subspace within ~2%
        assert sv.min() > 0.98, sv.min()
