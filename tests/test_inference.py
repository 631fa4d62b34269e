import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as sciR

from lc_tpu import geom, inference

K = np.array([[500.0, 0, 32.0], [0, 500.0, 32.0], [0, 0, 1]], np.float32)


def synth_dense_out(batch=2, h=16, w=16, seed=0, noise=0.0, scale=100.0,
                    zrange=(380.0, 620.0)):
    """Build a perfect dense prediction for known poses: NOC such that
    project(K, noc*scale, R, t) == pixel grid."""
    rng = np.random.default_rng(seed)
    Rs = sciR.random(batch, random_state=seed).as_matrix().astype(np.float32)
    ts = np.concatenate((rng.uniform(-5, 5, (batch, 2)),
                         rng.uniform(400, 600, (batch, 1))), -1).astype(np.float32)
    uv = np.asarray(geom.gen_uv((h, w))).reshape(-1, 2)
    # choose per-pixel depth, backproject into model frame
    z = rng.uniform(*zrange, (batch, h * w, 1)).astype(np.float32)
    homo = np.concatenate((np.broadcast_to(uv, (batch, h * w, 2)) * z, z), -1)
    xyz = np.asarray(geom.xyz_from_homo_z(
        jnp.asarray(homo), jnp.asarray(Rs), jnp.asarray(ts),
        jnp.asarray(np.broadcast_to(K, (batch, 3, 3)))))
    xyz = xyz + rng.normal(size=xyz.shape).astype(np.float32) * noise
    noc = (xyz / scale).reshape(batch, h, w, 3)
    out = {
        'xyz_noc': jnp.asarray(noc),
        'xyz_weight_logits': jnp.zeros((batch, h, w, 2)),
        'xyz_weights_scale': jnp.full((batch, 1, 1, 1), float(2 * h * w)),
        'msk_vis_logits': jnp.full((batch, h, w, 1), 5.0),
    }
    gt = {
        'out_K': jnp.asarray(np.broadcast_to(K, (batch, 3, 3)).copy()),
        'noc_scale': jnp.full((batch, 3), scale),
    }
    pose = np.asarray(geom.RT_to_pose7(jnp.asarray(Rs), jnp.asarray(ts)))
    return out, gt, pose


class TestQuantileMask:
    def test_scalar_quantile(self):
        w = jnp.asarray(np.arange(20, dtype=np.float32).reshape(1, 10, 2))
        m = np.asarray(inference.quantile_mask(w, 0.5))
        assert m.sum() == 5 or m.sum() == 6  # top half kept

    def test_per_sample_quantile(self):
        w = jnp.asarray(np.random.default_rng(0).random((3, 50, 2)),
                        jnp.float32)
        q = jnp.asarray([0.2, 0.5, 0.8])
        m = np.asarray(inference.quantile_mask(w, q))
        fracs = m.mean(axis=1)
        np.testing.assert_allclose(fracs, [0.8, 0.5, 0.2], atol=0.06)


class TestSolveDense:
    @pytest.mark.parametrize("select", ['quantile', 'mask', 'quantile_in_mask'])
    @pytest.mark.slow  # ~100s solve-chain compile; run_test path guarded quick by test_integration
    def test_recovers_pose(self, select):
        out, gt, pose = synth_dense_out(noise=0.05)
        states = inference.solve_pnp_dense(
            out, gt, jax.random.PRNGKey(0), sample=2, point_select=select,
            quantile=0.3, solvers=('ransac', 'weighted'))
        for name in ('ransac', 'weighted'):
            p = np.asarray(states[name])
            np.testing.assert_allclose(p[:, 4:], pose[:, 4:], atol=3.0)
            dot = np.abs(np.sum(p[:, :4] * pose[:, :4], axis=-1))
            assert np.all(dot > 0.999), name

    @pytest.mark.slow  # ~100s solve-chain compile; run_test path guarded quick by test_integration
    def test_weighted_filtered(self):
        out, gt, pose = synth_dense_out(noise=0.05)
        states = inference.solve_pnp_dense(
            out, gt, jax.random.PRNGKey(1), sample=1, point_select='mask',
            solvers=('weighted_filtered',))
        p = np.asarray(states['weighted-filtered'])
        np.testing.assert_allclose(p[:, 4:], pose[:, 4:], atol=3.0)

    @pytest.mark.slow  # ~100s solve-chain compile; run_test path guarded quick by test_integration
    def test_binary_head_path(self):
        """Dense solve through the Gray-code decode path. Object-like geometry:
        a shallow depth field so 7-bit quantization stays ~1 mm (the production
        regime), and a noc_scale that bounds the model extent (clipped NOC would
        corrupt the correspondences)."""
        from lc_tpu import codec
        out, gt, pose = synth_dense_out(noise=0.0, scale=120.0,
                                        zrange=(500.0, 560.0))
        bit_cnt = (7, 7, 7)
        noc = np.clip(np.asarray(out.pop('xyz_noc')), -0.999, 0.999)
        mod, _ = codec.noc_to_bits(jnp.asarray(noc), bit_cnt, False)
        out['xyz_noc_bin'] = jnp.where(mod, 10.0, -10.0)
        states = inference.solve_pnp_dense(
            out, gt, jax.random.PRNGKey(2), bit_cnt=bit_cnt, sample=1,
            point_select='mask', solvers=('weighted',))
        p = np.asarray(states['weighted'])
        # 7-bit quantization leaves ~1% NOC error: pose within a few mm / degrees
        np.testing.assert_allclose(p[:, 4:], pose[:, 4:], atol=10.0)
        dot = np.abs(np.sum(p[:, :4] * pose[:, :4], axis=-1))
        assert np.all(dot > 0.995)


class TestSolveSparse:
    @pytest.mark.slow  # ~80s; sparse chain also guarded by test_integration_sparse
    def test_recovers_pose(self):
        rng = np.random.default_rng(3)
        B, S = 2, 16
        Rs = sciR.random(B, random_state=3).as_matrix().astype(np.float32)
        ts = np.concatenate((rng.uniform(-5, 5, (B, 2)),
                             rng.uniform(400, 600, (B, 1))), -1).astype(np.float32)
        pts3d = rng.uniform(-30, 30, (B, S, 3)).astype(np.float32)
        Ks = np.broadcast_to(K, (B, 3, 3))
        uv = np.asarray(geom.project_apply(jnp.asarray(Ks), jnp.asarray(pts3d),
                                           jnp.asarray(Rs), jnp.asarray(ts)))
        out = {'pts2d': jnp.asarray(uv + 0.1),
               'pts2d_std': jnp.full((B, S, 2), 0.5)}
        gt = {'out_K': jnp.asarray(Ks.copy()), 'pts3d': jnp.asarray(pts3d)}
        states = inference.solve_pnp_sparse(out, gt, jax.random.PRNGKey(0))
        pose = np.asarray(geom.RT_to_pose7(jnp.asarray(Rs), jnp.asarray(ts)))
        p = np.asarray(states['weighted'])
        np.testing.assert_allclose(p[:, 4:], pose[:, 4:], atol=2.0)


class TestQuantileBisect:
    """quantile_mask_bisect must match quantile_mask (and numpy 'linear'
    quantile) exactly — it is the sort-free candidate for the TPU hot path."""

    def test_matches_sort_version(self):
        from lc_tpu.inference import quantile_mask, quantile_mask_bisect
        rng = np.random.default_rng(9)
        for q in (0.0, 0.3, 0.5, 0.73, 1.0):
            w2 = jnp.asarray(rng.uniform(0, 5, (6, 257, 2)), jnp.float32)
            a = np.asarray(quantile_mask(w2, q))
            b = np.asarray(quantile_mask_bisect(w2, q))
            np.testing.assert_array_equal(a, b)

    def test_matches_numpy_threshold(self):
        from lc_tpu.inference import quantile_mask_bisect
        rng = np.random.default_rng(10)
        w2 = jnp.asarray(rng.normal(size=(4, 128, 2)), jnp.float32)
        q = 0.3
        m = np.asarray(quantile_mask_bisect(w2, q))
        w = np.asarray(w2).sum(-1)
        thr = np.quantile(w.astype(np.float64), q, axis=-1,
                          method='linear').astype(np.float32)
        np.testing.assert_array_equal(m, w >= thr[:, None])

    def test_wide_dynamic_range(self):
        # softmax*exp-scale production weights span many orders of magnitude;
        # value-range bisection had resolution (max-min)/2^32 and returned
        # e.g. 4669.9 for a true 0.0039 quantile — the int32 bit-pattern
        # bisection must stay exact (advisor round-2 high finding)
        from lc_tpu.inference import quantile_mask, quantile_mask_bisect
        rng = np.random.default_rng(12)
        w2 = jnp.asarray(np.exp(rng.normal(0, 10, (4, 512, 2))), jnp.float32)
        for q in (0.1, 0.3, 0.7):
            a = np.asarray(quantile_mask(w2, q))
            b = np.asarray(quantile_mask_bisect(w2, q))
            np.testing.assert_array_equal(a, b)
            # sanity: the mask keeps ~ (1-q) of the points, not almost none
            frac = b.mean(axis=-1)
            assert np.all(frac >= (1 - q) - 0.01), (q, frac)

    def test_per_sample_quantiles_and_ties(self):
        from lc_tpu.inference import quantile_mask, quantile_mask_bisect
        rng = np.random.default_rng(11)
        # heavy ties: integer-valued weights
        w2 = jnp.asarray(rng.integers(0, 4, (5, 64, 2)).astype(np.float32))
        q = jnp.asarray(rng.uniform(0.1, 0.9, (5,)), jnp.float32)
        a = np.asarray(quantile_mask(w2, q))
        b = np.asarray(quantile_mask_bisect(w2, q))
        np.testing.assert_array_equal(a, b)
