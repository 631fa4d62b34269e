import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as sciR

from lc_tpu import geom, loss as L

RNG = np.random.default_rng(7)
K = np.array([[572.4, 0, 32.0], [0, 573.6, 32.0], [0, 0, 1]], np.float32)


def make_lc_inputs(batch=2, n=48, seed=0, noise=0.5, inv_std=2.0):
    rng = np.random.default_rng(seed)
    Rs = sciR.random(batch, random_state=seed).as_matrix().astype(np.float32)
    ts = np.concatenate((rng.uniform(-10, 10, (batch, 2)),
                         rng.uniform(500, 700, (batch, 1))), -1).astype(np.float32)
    pose = np.asarray(geom.RT_to_pose7(jnp.asarray(Rs), jnp.asarray(ts)))
    pts3d = rng.uniform(-40, 40, (batch, n, 3)).astype(np.float32)
    Ks = np.broadcast_to(K, (batch, 3, 3)).astype(np.float32)
    proj = np.asarray(geom.project_apply(jnp.asarray(Ks), jnp.asarray(pts3d),
                                         jnp.asarray(Rs), jnp.asarray(ts)))
    pts2d = proj + rng.normal(size=proj.shape).astype(np.float32) * noise
    inv = np.full((batch, n, 2), inv_std, np.float32)
    bbox = rng.uniform(-50, 50, (batch, 8, 3)).astype(np.float32)
    return (jnp.asarray(Ks), jnp.asarray(pose), jnp.asarray(pts3d),
            jnp.asarray(pts2d), jnp.asarray(inv), jnp.asarray(bbox))


class TestPrimitives:
    def test_twice_huber(self):
        x = jnp.asarray([0.5, 1.0, 2.0, 4.0])
        out = np.asarray(L.twice_huber(x, 1.0))
        np.testing.assert_allclose(out, [0.25, 1.0, 3.0, 7.0])

    def test_clamp_error_shrinks_long_vectors(self):
        err = jnp.asarray([[[3.0, 4.0], [0.3, 0.4]]])  # norms 5, 0.5
        out = np.asarray(L.clamp_error(err, 1.0))
        np.testing.assert_allclose(np.linalg.norm(out[0, 0]), 1.0, rtol=1e-4)
        np.testing.assert_allclose(out[0, 1], [0.3, 0.4], rtol=1e-5)

    def test_clamp_error_gradient_is_identity(self):
        err = jnp.asarray([[[3.0, 4.0]]])
        g = jax.grad(lambda e: jnp.sum(L.clamp_error(e, 1.0)))(err)
        np.testing.assert_allclose(np.asarray(g), np.ones_like(g))

    def test_robust_weights_cov_shapes_and_huberization(self):
        inv_std = jnp.full((2, 16, 2), 2.0)
        err = jnp.concatenate(
            (jnp.full((2, 15, 2), 0.1), jnp.full((2, 1, 2), 50.0)), axis=1)
        w, cov = L.robust_weights_cov(inv_std, err, None)
        assert w.shape == (2, 16, 2) and cov.shape == (2, 16, 2)
        # the outlier's cov estimate is huberized below the raw square
        assert float(cov[0, -1, 0]) < 50.0 ** 2

    def test_jac_update_to_alter_matches_fd(self):
        Ks, pose, pts3d, pts2d, inv, bbox = make_lc_inputs(batch=1)
        jac = np.asarray(L.jac_update_to_alter(
            pose, lambda st: L.xform_3d(st, bbox[0])))[0]
        eps = 1e-3
        for k in range(6):
            d = np.zeros((1, 6), np.float32)
            d[0, k] = eps
            p = np.asarray(L.xform_3d(geom.apply_perturb(pose, jnp.asarray(d)),
                                      bbox[0]))[0]
            m = np.asarray(L.xform_3d(geom.apply_perturb(pose, jnp.asarray(-d)),
                                      bbox[0]))[0]
            np.testing.assert_allclose(jac[:, k], (p - m) / (2 * eps),
                                       rtol=1e-2, atol=1e-2)


class TestLossCovMixed:
    def test_finite_and_shaped(self):
        Ks, pose, pts3d, pts2d, inv, bbox = make_lc_inputs()
        out = L.loss_cov_mixed(Ks, pose, pts3d, pts2d, inv, None, bbox_3d=bbox)
        assert out.shape == (2,)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_confident_weights_on_good_points_lower_loss(self):
        """Higher claimed precision on accurate points should reduce the loss;
        overclaiming precision on noisy points should raise it."""
        Ks, pose, pts3d, pts2d, inv, bbox = make_lc_inputs(noise=0.1, inv_std=3.0)
        base = float(jnp.mean(L.loss_cov_mixed(Ks, pose, pts3d, pts2d, inv, None,
                                               bbox_3d=bbox)))
        lower = float(jnp.mean(L.loss_cov_mixed(Ks, pose, pts3d, pts2d, inv * 0.3,
                                                None, bbox_3d=bbox)))
        assert base < lower  # confident & right beats underconfident

        Ks2, pose2, pts3d2, noisy2, inv2, bbox2 = make_lc_inputs(noise=6.0,
                                                                 inv_std=10.0)
        over = float(jnp.mean(L.loss_cov_mixed(Ks2, pose2, pts3d2, noisy2, inv2,
                                               None, bbox_3d=bbox2)))
        honest = float(jnp.mean(L.loss_cov_mixed(Ks2, pose2, pts3d2, noisy2,
                                                 inv2 * 0.02, None, bbox_3d=bbox2)))
        assert honest < over  # claiming 0.1px precision on 6px noise is punished

    def test_gradients_flow_to_weights_and_points(self):
        Ks, pose, pts3d, pts2d, inv, bbox = make_lc_inputs(batch=1)

        def f(inv_std, p3d, p2d):
            return jnp.mean(L.loss_cov_mixed(Ks, pose, p3d, p2d, inv_std, None,
                                             bbox_3d=bbox))

        g_inv, g_p3, g_p2 = jax.grad(f, argnums=(0, 1, 2))(inv, pts3d, pts2d)
        for g in (g_inv, g_p3, g_p2):
            arr = np.asarray(g)
            assert np.all(np.isfinite(arr)) and np.abs(arr).max() > 0

    def test_jit(self):
        Ks, pose, pts3d, pts2d, inv, bbox = make_lc_inputs()
        f = jax.jit(lambda *a: L.loss_cov_mixed(*a[:5], None, bbox_3d=a[5]))
        out = f(Ks, pose, pts3d, pts2d, inv, bbox)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_cov_2d_variant(self):
        """The 2D variant (reference cov_mixed.py:92,125-127: propagate to the 16
        projected bbox-corner coords instead of the 24 3D ones) is finite,
        differentiable, differs from the 3D variant, and keeps the calibration
        ordering (overclaimed precision on noisy points is punished)."""
        Ks, pose, pts3d, pts2d, inv, bbox = make_lc_inputs(noise=0.1, inv_std=3.0)
        l2d = L.loss_cov_mixed(Ks, pose, pts3d, pts2d, inv, None, bbox_3d=bbox,
                               cov_2d=True)
        l3d = L.loss_cov_mixed(Ks, pose, pts3d, pts2d, inv, None, bbox_3d=bbox)
        assert l2d.shape == (2,) and np.all(np.isfinite(np.asarray(l2d)))
        assert np.abs(np.asarray(l2d) - np.asarray(l3d)).max() > 1e-4

        Ks2, pose2, pts3d2, noisy2, inv2, bbox2 = make_lc_inputs(noise=6.0,
                                                                 inv_std=10.0)
        over = float(jnp.mean(L.loss_cov_mixed(
            Ks2, pose2, pts3d2, noisy2, inv2, None, bbox_3d=bbox2, cov_2d=True)))
        honest = float(jnp.mean(L.loss_cov_mixed(
            Ks2, pose2, pts3d2, noisy2, inv2 * 0.02, None, bbox_3d=bbox2,
            cov_2d=True)))
        assert honest < over

        def f(inv_std):
            return jnp.mean(L.loss_cov_mixed(Ks, pose, pts3d, pts2d, inv_std,
                                             None, bbox_3d=bbox, cov_2d=True))
        g = np.asarray(jax.grad(f)(inv))
        assert np.all(np.isfinite(g)) and np.abs(g).max() > 0


class TestGradTap:
    def test_clips_and_reports_norm(self):
        x = jnp.full((4, 4), 2.0)

        def f(x, tap):
            y = L.grad_tap(x, jnp.asarray(1.0), tap)
            return jnp.sum(y * 3.0)

        (gx, gtap) = jax.grad(f, argnums=(0, 1))(x, jnp.zeros(()))
        # raw cotangent is all-3 with norm 12; clipped to norm 1
        np.testing.assert_allclose(np.linalg.norm(np.asarray(gx)), 1.0, rtol=1e-4)
        np.testing.assert_allclose(float(gtap), 12.0, rtol=1e-5)

    def test_clipper_state_ema(self):
        st = L.init_clipper_state()
        st1 = L.update_clipper_state(st, jnp.asarray(10.0))
        np.testing.assert_allclose(float(st1.max_norm), 17.0)  # 10 * (1 + 0.7)
        st2 = L.update_clipper_state(st1, jnp.asarray(10.0))
        # ema: 17*0.9 + 0.1*1.7*min(10, 17*1.7)
        np.testing.assert_allclose(float(st2.max_norm), 17.0 * 0.9 + 1.7, rtol=1e-5)


class TestSurrogates:
    def test_xyz_bin_loss_decreases_with_correct_bits(self):
        hist = L.init_bin_histogram(6)
        gt_bits = (RNG.random((2, 8, 8, 6)) > 0.5).astype(np.float32)
        good_logits = jnp.asarray((gt_bits * 2 - 1) * 5.0)
        bad_logits = -good_logits
        msk = jnp.full((2, 8, 8, 1), 5.0)
        lg, _ = L.xyz_bin_loss(good_logits, jnp.asarray(gt_bits), msk, hist)
        lb, _ = L.xyz_bin_loss(bad_logits, jnp.asarray(gt_bits), msk, hist)
        assert float(lg) < float(lb)

    def test_seg_l1(self):
        logits = jnp.asarray([[100.0, -100.0]])
        target = jnp.asarray([[1.0, 0.0]])
        assert float(L.seg_l1_loss(logits, target)) < 1e-6


class TestTargets:
    def _gt_blob(self, batch=2, h=8, w=8, n_k=1, seed=0):
        rng = np.random.default_rng(seed)
        Rs = sciR.random(batch, random_state=seed).as_matrix().astype(np.float32)
        ts = np.concatenate((rng.uniform(-10, 10, (batch, 2)),
                             rng.uniform(500, 700, (batch, 1))), -1).astype(np.float32)
        Ks = np.broadcast_to(K, (batch, 3, 3)).astype(np.float32)
        # synthesize homo_z from a plane of model points
        uv = np.asarray(geom.gen_uv((h, w))).reshape(-1, 2)
        z = rng.uniform(550, 650, (batch, h * w, 1)).astype(np.float32)
        homo = np.concatenate((uv[None].repeat(batch, 0) * z, z), -1) \
            .astype(np.float32)
        cands = np.repeat(
            np.concatenate((Rs, ts[..., None]), -1)[:, None], n_k, axis=1)
        gt = dict(
            Rt_candi=jnp.asarray(cands),
            candi_valid=jnp.ones((batch, n_k), bool),
            homo_z_out=jnp.asarray(homo.reshape(batch, h, w, 3)),
            K_no_aug=jnp.asarray(Ks),
            msk_noc=jnp.ones((batch, h, w), np.float32),
            msk_vis=jnp.ones((batch, h, w), np.float32),
            sym_ck_pts2d=jnp.zeros((batch, 16, 2), jnp.int32),
            noc_scale=jnp.full((batch, 3), 100.0),
            out_K=jnp.asarray(Ks),
            bbox_3d=jnp.asarray(rng.uniform(-50, 50, (batch, 8, 3)).astype(np.float32)),
        )
        return gt, Rs, ts

    def test_annots_continuous_roundtrip(self):
        gt, Rs, ts = self._gt_blob()
        out = {'xyz_noc': jnp.zeros((2, 8, 8, 3))}
        ann = L.annots_on_the_fly(gt, out, step=0)
        assert 'xyz_noc_tgt' in ann
        # xyz_gt backprojected with the GT pose must satisfy projection consistency
        xyz = np.asarray(ann['xyz_gt']).reshape(2, -1, 3)
        proj = np.asarray(geom.project_apply(gt['out_K'], jnp.asarray(xyz),
                                             jnp.asarray(Rs), jnp.asarray(ts)))
        uv = np.asarray(geom.gen_uv((8, 8))).reshape(-1, 2)
        np.testing.assert_allclose(proj, np.broadcast_to(uv, proj.shape), atol=1e-2)
        # target = xyz / noc_scale
        np.testing.assert_allclose(np.asarray(ann['xyz_noc_tgt']),
                                   np.asarray(ann['xyz_gt']) / 100.0, atol=1e-5)

    def test_annots_binary_targets(self):
        gt, _, _ = self._gt_blob()
        bit_cnt = (4, 4, 4)
        out = {'xyz_noc_bin': jnp.zeros((2, 8, 8, 12)),
               'msk_vis_logits': jnp.ones((2, 8, 8, 1))}
        ann = L.annots_on_the_fly(gt, out, step=0, bit_cnt=bit_cnt)
        assert ann['xyz_noc_bin_tgt'].shape == (2, 8, 8, 12)
        assert ann['xyz_noc_bin_raw'].shape == (2, 8, 8, 12)


class TestComputeLosses:
    def _dense_setup(self, bit_cnt=None):
        batch, h, w = 2, 16, 16
        rng = np.random.default_rng(3)
        gt, Rs, ts = TestTargets()._gt_blob(batch=batch, h=h, w=w)
        pose = np.asarray(geom.RT_to_pose7(jnp.asarray(Rs), jnp.asarray(ts)))
        gt['pose_best'] = jnp.asarray(pose)
        nbits = sum(bit_cnt) if bit_cnt else 0
        out = {
            'xyz_weight_logits': jnp.asarray(
                rng.normal(size=(batch, h, w, 2)).astype(np.float32)),
            'xyz_weights_scale': jnp.full((batch, 1, 1, 1), float(h * w)),
            'msk_vis_logits': jnp.asarray(
                rng.normal(size=(batch, h, w, 1)).astype(np.float32)),
        }
        if bit_cnt:
            out['xyz_noc_bin'] = jnp.asarray(
                rng.normal(size=(batch, h, w, nbits)).astype(np.float32))
            ann = L.annots_on_the_fly(gt, out, step=0, bit_cnt=bit_cnt)
        else:
            out['xyz_noc'] = jnp.asarray(
                rng.normal(size=(batch, h, w, 3)).astype(np.float32) * 0.3)
            ann = L.annots_on_the_fly(gt, out, step=0)
        gt.update(ann)
        return gt, out

    def test_dense_noc_path(self):
        gt, out = self._dense_setup()
        cfg = L.LossConfig(w_loss_noc=1.0, w_loss_seg=0.25, w_loss_pose=0.02,
                           full_pose_loss_step=10)
        state = L.init_loss_state(cfg)
        total, ld, _ = L.compute_losses(cfg, gt, out, state, step=100,
                                        taps=L.zero_taps())
        assert np.isfinite(float(total))
        assert set(ld) == {'loss_noc', 'loss_seg', 'loss_pose'}

    def test_dense_noc_path_cov_2d(self):
        gt, out = self._dense_setup()
        cfg = L.LossConfig(w_loss_noc=1.0, w_loss_seg=0.25, w_loss_pose=0.02,
                           full_pose_loss_step=10, cov_2d=True)
        state = L.init_loss_state(cfg)
        total, ld, _ = L.compute_losses(cfg, gt, out, state, step=100,
                                        taps=L.zero_taps())
        assert np.isfinite(float(total))
        cfg3 = L.LossConfig(w_loss_noc=1.0, w_loss_seg=0.25, w_loss_pose=0.02,
                            full_pose_loss_step=10)
        total3, _, _ = L.compute_losses(cfg3, gt, out, state, step=100,
                                        taps=L.zero_taps())
        assert abs(float(total) - float(total3)) > 1e-6  # variant actually used

    def test_dense_bin_path(self):
        bit_cnt = (4, 4, 4)
        gt, out = self._dense_setup(bit_cnt=bit_cnt)
        cfg = L.LossConfig(w_loss_noc_bin=3.0, w_loss_seg=1.0, w_loss_pose=0.03,
                           seg_loss_type='l1', bit_cnt=bit_cnt,
                           full_pose_loss_step=10, dense_sample=3)
        state = L.init_loss_state(cfg)
        total, ld, new_state = L.compute_losses(cfg, gt, out, state, step=100,
                                                taps=L.zero_taps())
        assert np.isfinite(float(total))
        assert not np.allclose(np.asarray(new_state.histogram), 0.5)

    def test_grad_and_tap_flow(self):
        gt, out = self._dense_setup()
        cfg = L.LossConfig(w_loss_noc=1.0, w_loss_seg=0.25, w_loss_pose=0.02,
                           full_pose_loss_step=10, clip_weight_grad=True)
        state = L.init_loss_state(cfg)

        def f(out_dict, taps):
            total, _, _ = L.compute_losses(cfg, gt, out_dict, state, step=100,
                                           taps=taps)
            return total

        (g_out, g_taps) = jax.grad(f, argnums=(0, 1))(out, L.zero_taps())
        assert float(g_taps['weight']) > 0  # observed norm reported
        for v in jax.tree.leaves(g_out):
            assert np.all(np.isfinite(np.asarray(v)))

    def test_ramp_blends(self):
        gt, out = self._dense_setup()
        cfg = L.LossConfig(w_loss_noc=1.0, w_loss_seg=0.25, w_loss_pose=0.02,
                           full_pose_loss_step=1000, loss_pose_nz_step=0)
        state = L.init_loss_state(cfg)
        _, ld_early, _ = L.compute_losses(cfg, gt, out, state, step=0,
                                          taps=L.zero_taps())
        _, ld_late, _ = L.compute_losses(cfg, gt, out, state, step=5000,
                                         taps=L.zero_taps())
        assert not np.isclose(float(ld_early['loss_pose']),
                              float(ld_late['loss_pose']))
