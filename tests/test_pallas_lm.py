"""Fused Pallas LM kernel vs the XLA reference solver."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as sciR

from lc_tpu import geom
from lc_tpu.pnp.solver import lm_refine
from lc_tpu.pnp.pallas_lm import pallas_lm_refine

K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32)


def make_problem(n_pts=100, batch=4, seed=0, noise=0.3):
    rng = np.random.default_rng(seed)
    Rs = sciR.random(batch, random_state=seed).as_matrix().astype(np.float32)
    ts = np.concatenate((rng.uniform(-50, 50, (batch, 2)),
                         rng.uniform(600, 800, (batch, 1))), -1).astype(np.float32)
    pts3d = rng.uniform(-40, 40, (batch, n_pts, 3)).astype(np.float32)
    Ks = np.broadcast_to(K, (batch, 3, 3)).astype(np.float32)
    pose = np.asarray(geom.RT_to_pose7(jnp.asarray(Rs), jnp.asarray(ts)))
    uv = np.asarray(geom.project_apply(jnp.asarray(Ks), jnp.asarray(pts3d),
                                       jnp.asarray(Rs), jnp.asarray(ts)))
    uv = uv + rng.normal(size=uv.shape).astype(np.float32) * noise
    d = rng.normal(size=(batch, 6)).astype(np.float32) * np.array(
        [0.04, 0.04, 0.04, 8, 8, 15], np.float32)
    start = np.asarray(geom.apply_perturb(jnp.asarray(pose), jnp.asarray(d)))
    w = rng.uniform(0.5, 2.0, (batch, n_pts, 2)).astype(np.float32)
    return pose, start, Ks, pts3d, uv, w


class TestPallasLM:
    def test_matches_xla_solver(self):
        pose, start, Ks, pts3d, uv, w = make_problem()
        ref = lm_refine(jnp.asarray(start), jnp.asarray(Ks), jnp.asarray(pts3d),
                        jnp.asarray(uv), jnp.asarray(w))
        out = pallas_lm_refine(jnp.asarray(start), jnp.asarray(Ks),
                               jnp.asarray(pts3d), jnp.asarray(uv),
                               jnp.asarray(w), interpret=True)
        assert not np.any(np.asarray(out.invalid))
        # both converge to the same optimum (not necessarily same iterates)
        np.testing.assert_allclose(np.asarray(out.pose7[:, 4:]),
                                   np.asarray(ref.pose7[:, 4:]), atol=0.05)
        dot = np.abs(np.sum(np.asarray(out.pose7[:, :4])
                            * np.asarray(ref.pose7[:, :4]), axis=-1))
        assert np.all(dot > 1 - 1e-5)
        np.testing.assert_allclose(np.asarray(out.cost), np.asarray(ref.cost),
                                   rtol=1e-3)

    def test_valid_mask_and_too_few(self):
        pose, start, Ks, pts3d, uv, w = make_problem(batch=2, n_pts=32)
        valid = np.ones((2, 32), bool)
        valid[0, 16:] = False
        valid[1, 2:] = False  # < 3 points -> invalid, keeps start
        out = pallas_lm_refine(jnp.asarray(start), jnp.asarray(Ks),
                               jnp.asarray(pts3d), jnp.asarray(uv),
                               jnp.asarray(w), valid=jnp.asarray(valid),
                               interpret=True)
        assert not np.asarray(out.invalid)[0]
        assert np.asarray(out.invalid)[1]
        np.testing.assert_allclose(np.asarray(out.pose7)[1], start[1], atol=1e-6)
        # 16 points at 0.3 px noise: expect mm-scale recovery, not exact
        np.testing.assert_allclose(np.asarray(out.pose7[0, 4:]), pose[0, 4:],
                                   atol=2.5)

    def test_nonmultiple_of_128_padding(self):
        pose, start, Ks, pts3d, uv, w = make_problem(batch=2, n_pts=100)
        full = pallas_lm_refine(jnp.asarray(start), jnp.asarray(Ks),
                                jnp.asarray(pts3d), jnp.asarray(uv),
                                jnp.asarray(w), interpret=True)
        # same problem padded by caller with zero-weight garbage
        pts3d_p = np.concatenate(
            (pts3d, np.random.default_rng(1).normal(size=(2, 28, 3))
             .astype(np.float32)), axis=1)
        uv_p = np.concatenate((uv, np.zeros((2, 28, 2), np.float32)), axis=1)
        w_p = np.concatenate((w, np.zeros((2, 28, 2), np.float32)), axis=1)
        padded = pallas_lm_refine(jnp.asarray(start), jnp.asarray(Ks),
                                  jnp.asarray(pts3d_p), jnp.asarray(uv_p),
                                  jnp.asarray(w_p), interpret=True)
        np.testing.assert_allclose(np.asarray(padded.pose7),
                                   np.asarray(full.pose7), atol=1e-4)
