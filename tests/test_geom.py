import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as sciR

from lc_tpu import geom

RNG = np.random.default_rng(0)


def random_quats(n):
    q = RNG.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.where(q[:, :1] < 0, -q, q).astype(np.float32)


def sciR_from_wijk(q):
    return sciR.from_quat(np.roll(q, -1, axis=-1))  # scipy uses xyzw


class TestRotations:
    def test_quaternion_to_matrix_vs_scipy(self):
        q = random_quats(64)
        m = np.asarray(geom.quaternion_to_matrix(jnp.asarray(q)))
        m_ref = sciR_from_wijk(q).as_matrix()
        np.testing.assert_allclose(m, m_ref, atol=1e-5)

    def test_matrix_to_quaternion_roundtrip(self):
        q = random_quats(256)
        m = sciR_from_wijk(q).as_matrix().astype(np.float32)
        q2 = np.asarray(geom.matrix_to_quaternion(jnp.asarray(m)))
        np.testing.assert_allclose(q2, q, atol=1e-4)

    def test_matrix_to_quaternion_edge_cases(self):
        # 180-degree rotations about each axis stress each Shepperd branch
        for axis in np.eye(3):
            m = sciR.from_rotvec(np.pi * axis).as_matrix().astype(np.float32)
            q = np.asarray(geom.matrix_to_quaternion(jnp.asarray(m)))
            m2 = np.asarray(geom.quaternion_to_matrix(jnp.asarray(q)))
            np.testing.assert_allclose(m2, m, atol=1e-5)
        q_id = np.asarray(geom.matrix_to_quaternion(jnp.eye(3)))
        np.testing.assert_allclose(q_id, [1, 0, 0, 0], atol=1e-6)

    def test_axis_angle_quaternion_roundtrip(self):
        aa = RNG.normal(size=(64, 3)).astype(np.float32)
        aa = aa / np.linalg.norm(aa, axis=-1, keepdims=True) \
            * RNG.uniform(0.01, 3.1, size=(64, 1)).astype(np.float32)
        q = np.asarray(geom.axis_angle_to_quaternion(jnp.asarray(aa)))
        q_ref = sciR.from_rotvec(aa).as_quat()  # xyzw
        np.testing.assert_allclose(q, np.roll(q_ref, 1, axis=-1), atol=1e-5)
        aa2 = np.asarray(geom.quaternion_to_axis_angle(jnp.asarray(q)))
        np.testing.assert_allclose(aa2, aa, atol=1e-4)

    def test_axis_angle_near_zero(self):
        aa = (RNG.normal(size=(32, 3)) * 1e-4).astype(np.float32)
        q_taylor = np.asarray(geom.axis_angle_to_quaternion_near_zero(jnp.asarray(aa)))
        q_exact = np.asarray(geom.axis_angle_to_quaternion(jnp.asarray(aa)))
        np.testing.assert_allclose(q_taylor, q_exact, atol=1e-7)
        # differentiable at exactly zero with correct jacobian dq/daa = [0; I/2]
        jac = jax.jacfwd(geom.axis_angle_to_quaternion_near_zero)(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(jac)[1:], 0.5 * np.eye(3), atol=1e-7)
        np.testing.assert_allclose(np.asarray(jac)[0], 0.0, atol=1e-7)

    def test_quaternion_multiply_matches_matrix_product(self):
        a, b = random_quats(16), random_quats(16)
        q = np.asarray(geom.quaternion_raw_multiply(jnp.asarray(a), jnp.asarray(b)))
        m = sciR_from_wijk(a).as_matrix() @ sciR_from_wijk(b).as_matrix()
        m_q = np.asarray(geom.quaternion_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(m_q, m, atol=1e-5)

    def test_skew_symmetric(self):
        v = RNG.normal(size=(8, 3)).astype(np.float32)
        p = RNG.normal(size=(8, 3)).astype(np.float32)
        sk = np.asarray(geom.skew_symmetric(jnp.asarray(v)))
        np.testing.assert_allclose(
            np.einsum('bij,bj->bi', sk, p), np.cross(v, p), atol=1e-6)


class TestRotationExtras:
    def test_quaternion_apply_vs_matrix(self):
        q = random_quats(32)
        p = RNG.normal(size=(32, 3)).astype(np.float32)
        got = np.asarray(geom.quaternion_apply(jnp.asarray(q), jnp.asarray(p)))
        want = np.einsum('nij,nj->ni',
                         np.asarray(geom.quaternion_to_matrix(jnp.asarray(q))),
                         p)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rotation_6d_roundtrip(self):
        m = sciR.random(48, random_state=5).as_matrix().astype(np.float32)
        d6 = np.asarray(geom.matrix_to_rotation_6d(jnp.asarray(m)))
        m2 = np.asarray(geom.rotation_6d_to_matrix(jnp.asarray(d6)))
        np.testing.assert_allclose(m2, m, atol=1e-5)

    def test_rotation_6d_noisy_is_orthonormal(self):
        d6 = RNG.normal(size=(16, 6)).astype(np.float32)
        m = np.asarray(geom.rotation_6d_to_matrix(jnp.asarray(d6)))
        eye = np.einsum('nij,nkj->nik', m, m)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                                   atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)

    @pytest.mark.parametrize('conv', ['XYZ', 'XZY', 'YXZ', 'YZX', 'ZXY', 'ZYX'])
    def test_euler_vs_scipy_and_roundtrip(self, conv):
        # central angle within (-pi/2, pi/2) keeps the Tait-Bryan chart invertible
        e = np.stack([RNG.uniform(-np.pi, np.pi, 64),
                      RNG.uniform(-1.4, 1.4, 64),
                      RNG.uniform(-np.pi, np.pi, 64)], -1).astype(np.float32)
        m = np.asarray(geom.euler_angles_to_matrix(jnp.asarray(e), conv))
        # pytorch3d/our convention: R = R(c0,e0) @ R(c1,e1) @ R(c2,e2)
        # == scipy intrinsic (uppercase) composition
        m_ref = sciR.from_euler(conv, e).as_matrix()
        np.testing.assert_allclose(m, m_ref, atol=1e-5)
        e2 = np.asarray(geom.matrix_to_euler_angles(jnp.asarray(m), conv))
        np.testing.assert_allclose(e2, e, atol=1e-4)


class TestPose:
    def test_pose7_roundtrip(self):
        q = random_quats(32)
        t = RNG.normal(size=(32, 3)).astype(np.float32)
        pose = np.concatenate((q, t), axis=-1)
        R, t2 = geom.pose7_to_RT(jnp.asarray(pose))
        pose2 = np.asarray(geom.RT_to_pose7(R, t2))
        np.testing.assert_allclose(pose2, pose, atol=1e-4)

    def test_apply_perturb(self):
        q = random_quats(8)
        t = RNG.normal(size=(8, 3)).astype(np.float32)
        pose = jnp.asarray(np.concatenate((q, t), axis=-1))
        d = jnp.asarray(RNG.normal(size=(8, 6)).astype(np.float32) * 1e-3)
        pert = geom.apply_perturb(pose, d)
        R0 = sciR_from_wijk(q).as_matrix()
        Rd = sciR.from_rotvec(np.asarray(d[:, :3])).as_matrix()
        R_ref = R0 @ Rd
        R_new = np.asarray(geom.quaternion_to_matrix(pert[..., :4]))
        np.testing.assert_allclose(R_new, R_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pert[..., 4:]), t + np.asarray(d[:, 3:]),
                                   atol=1e-6)


class TestProjection:
    def test_project_apply(self):
        K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]], np.float32)
        pts = RNG.normal(size=(5, 3)).astype(np.float32) * 0.1 + [0, 0, 1.0]
        R = sciR.random(random_state=3).as_matrix().astype(np.float32)
        t = np.array([0.05, -0.02, 1.2], np.float32)
        uv = np.asarray(geom.project_apply(jnp.asarray(K), jnp.asarray(pts),
                                           jnp.asarray(R), jnp.asarray(t)))
        cam = pts @ R.T + t
        uv_ref = (cam @ K.T)[:, :2] / (cam @ K.T)[:, 2:3]
        np.testing.assert_allclose(uv, uv_ref, rtol=1e-5)

    def test_gen_uv(self):
        uv = np.asarray(geom.gen_uv((4, 6)))
        assert uv.shape == (4, 6, 2)
        assert uv[2, 5, 0] == 5 and uv[2, 5, 1] == 2

    def test_xyz_from_homo_z_inverts_projection(self):
        K = jnp.asarray([[500.0, 0, 128], [0, 500, 128], [0, 0, 1]])
        R = jnp.asarray(sciR.random(random_state=7).as_matrix().astype(np.float32))
        t = jnp.asarray([10.0, -5.0, 600.0])
        pts_model = jnp.asarray(RNG.normal(size=(64, 3)).astype(np.float32) * 30)
        cam = pts_model @ R.T + t
        homo_z = cam @ K.T  # (u z, v z, z)
        rec = geom.xyz_from_homo_z(homo_z, R, t, K)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(pts_model), atol=1e-2)


def _reference_affine(center, scale, rot_rad, output_size):
    """Independent oracle: solve the 3-point system exactly as cv2.getAffineTransform
    would, using the reference's src/dst triangle construction (dataset.py:61-108)."""
    def get_dir(pt, r):
        sn, cs = np.sin(r), np.cos(r)
        return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs])

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]])

    w, h = output_size
    src = np.zeros((3, 2))
    dst = np.zeros((3, 2))
    src[0] = center
    src[1] = center + get_dir([0, scale * -0.5], rot_rad)
    dst[0] = [w * 0.5, h * 0.5]
    dst[1] = dst[0] + [0, w * -0.5]
    src[2] = third(src[0], src[1])
    dst[2] = third(dst[0], dst[1])
    A = np.zeros((6, 6))
    A[0::2, 0:2] = src
    A[0::2, 2] = 1
    A[1::2, 3:5] = src
    A[1::2, 5] = 1
    x = np.linalg.solve(A, dst.reshape(-1))
    return x.reshape(2, 3)


class TestAffine:
    @pytest.mark.parametrize("rot", [0.0, 0.3, -1.2, 3.7])
    def test_matches_threepoint_solution(self, rot):
        center = np.array([123.4, 87.9])
        scale = 210.0
        out = (64, 64)
        mine = geom.crop_affine(center, scale, rot, out)
        ref = _reference_affine(center, scale, rot, out)
        np.testing.assert_allclose(mine, ref, atol=1e-5)

    def test_invert(self):
        aff = geom.crop_affine(np.array([50.0, 60.0]), 100.0, 0.4, (64, 64))
        inv = geom.invert_affine(aff)
        pts = RNG.normal(size=(10, 2)).astype(np.float64) * 30 + 50
        mapped = pts @ aff[:2, :2].T + aff[:, 2]
        back = mapped @ inv[:2, :2].T + inv[:, 2]
        np.testing.assert_allclose(back, pts, atol=1e-4)

    def test_affine33(self):
        aff = geom.crop_affine(np.array([50.0, 60.0]), 100.0, 0.0, (64, 64))
        m33 = geom.affine33(aff)
        assert m33.shape == (3, 3)
        np.testing.assert_allclose(m33[2], [0, 0, 1])


class TestSymmetry:
    def _cube_info(self):
        # 4-fold discrete symmetry about z
        syms = []
        for k in range(1, 4):
            R = sciR.from_rotvec([0, 0, np.pi / 2 * k]).as_matrix()
            m = np.eye(4)
            m[:3, :3] = R
            syms.append(m.reshape(-1).tolist())
        return {'symmetries_discrete': syms}

    def test_discrete_candidates(self):
        R = sciR.random(random_state=11).as_matrix()
        t = np.array([1.0, 2.0, 500.0])
        cands = geom.symmetry_pose_candidates(R, t, self._cube_info())
        assert cands.shape == (4, 3, 4)
        np.testing.assert_allclose(cands[0, :, :3], R, atol=1e-6)
        np.testing.assert_allclose(cands[:, :, 3], np.broadcast_to(t, (4, 3)), atol=1e-4)

    def test_continuous_candidates_preserve_points_on_axis(self):
        info = {'symmetries_continuous': [{'axis': [0, 0, 1], 'offset': [0, 0, 0]}]}
        R = sciR.random(random_state=13).as_matrix()
        t = np.array([0.0, 0.0, 400.0])
        cands = geom.symmetry_pose_candidates(R, t, info, continuous_steps=8)
        assert cands.shape == (8, 3, 4)
        p_axis = np.array([0, 0, 7.0])
        mapped = cands[:, :, :3] @ p_axis + cands[:, :, 3]
        np.testing.assert_allclose(mapped, np.broadcast_to(R @ p_axis + t, (8, 3)),
                                   atol=1e-4)

    def test_select_pose_2d_picks_true_pose(self):
        K = jnp.asarray([[500.0, 0, 128], [0, 500, 128], [0, 0, 1]])[None]
        R = sciR.random(random_state=5).as_matrix().astype(np.float32)
        t = np.array([5.0, -3.0, 400.0], np.float32)
        info = self._cube_info()
        cands = geom.symmetry_pose_candidates(R, t, info)
        pts3d = RNG.normal(size=(32, 3)).astype(np.float32) * 20
        uv = geom.project_apply(K[0], jnp.asarray(pts3d), jnp.asarray(R), jnp.asarray(t))
        best = geom.select_pose_2d(K, jnp.asarray(pts3d)[None], uv[None],
                                   jnp.asarray(cands)[None])
        np.testing.assert_allclose(np.asarray(best[0, :, :3]), R, atol=1e-4)

    def test_select_pose_3d_with_padding(self):
        K = jnp.asarray([[500.0, 0, 128], [0, 500, 128], [0, 0, 1]])[None]
        R = sciR.random(random_state=6).as_matrix().astype(np.float32)
        t = np.array([0.0, 0.0, 300.0], np.float32)
        cands = geom.symmetry_pose_candidates(R, t, self._cube_info())
        # GT surface from the *second* candidate: selection must find index 1
        R1, t1 = cands[1, :, :3], cands[1, :, 3]
        pts_model = RNG.normal(size=(64, 3)).astype(np.float32) * 25
        cam = pts_model @ R1.T + t1
        homo_z = cam @ np.asarray(K[0]).T
        padded, valid = geom.symmetry.pad_candidates(cands, 8)
        best = geom.select_pose_3d(K, jnp.asarray(pts_model)[None],
                                   jnp.asarray(homo_z)[None],
                                   jnp.asarray(padded)[None],
                                   jnp.asarray(valid)[None])
        np.testing.assert_allclose(np.asarray(best[0, :, :3]), R1, atol=1e-4)
