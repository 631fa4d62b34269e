import os
import os.path as osp

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as sciR

from lc_tpu import eval as ev
from lc_tpu.data import synthetic
from lc_tpu.data.mesh import load_ply_mesh, rasterize_depth
from lc_tpu.utils.checkpoint import Checkpoint


class TestError6d:
    def _poses(self):
        R_gt = sciR.random(4, random_state=0).as_matrix().astype(np.float32)
        t_gt = np.tile([0, 0, 500.0], (4, 1)).astype(np.float32)
        return R_gt, t_gt

    def test_add_zero_for_identical(self):
        R, t = self._poses()
        pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32) * 30
        errs = ev.batched_pose_errors(R, t, R, t, pts)
        np.testing.assert_allclose(errs['add'], 0, atol=1e-3)
        np.testing.assert_allclose(errs['adi'], 0, atol=1e-3)
        np.testing.assert_allclose(errs['re'], 0, atol=0.1)
        np.testing.assert_allclose(errs['te'], 0, atol=1e-3)

    def test_te_translation_offset(self):
        R, t = self._poses()
        t2 = t + [3.0, 4.0, 0.0]
        pts = np.zeros((10, 3), np.float32)
        errs = ev.batched_pose_errors(R, t2, R, t, pts)
        np.testing.assert_allclose(errs['te'], 5.0, rtol=1e-4)
        np.testing.assert_allclose(errs['add'], 5.0, rtol=1e-4)

    def test_adi_symmetric_invariance(self):
        """ADI of a symmetric point set under its symmetry rotation is ~0 while
        ADD is large."""
        R = np.eye(3, dtype=np.float32)[None]
        t = np.array([[0, 0, 500.0]], np.float32)
        ang = np.pi
        R2 = sciR.from_rotvec([0, 0, ang]).as_matrix().astype(np.float32)[None]
        # ring of points in the xy plane: invariant under 180° z-rotation
        th = np.linspace(0, 2 * np.pi, 64, endpoint=False)
        pts = np.stack((np.cos(th), np.sin(th), np.zeros_like(th)),
                       -1).astype(np.float32) * 30
        errs = ev.batched_pose_errors(R2, t, R, t, pts)
        assert errs['adi'][0] < 0.1
        assert errs['add'][0] > 10.0

    def test_re_degrees(self):
        R1 = np.eye(3, dtype=np.float32)[None]
        R2 = sciR.from_rotvec([0, np.deg2rad(30), 0]).as_matrix() \
            .astype(np.float32)[None]
        t = np.zeros((1, 3), np.float32)
        errs = ev.batched_pose_errors(R2, t, R1, t, np.zeros((4, 3), np.float32))
        np.testing.assert_allclose(errs['re'], 30.0, rtol=1e-3)


class TestAUC:
    def test_posecnn_auc_extremes(self):
        assert ev.compute_auc_posecnn(np.full(100, 1.0)) > 0.97  # 1 mm, ~perfect
        assert ev.compute_auc_posecnn(np.full(100, 1e6)) != ev.compute_auc_posecnn(
            np.full(100, 1.0))

    def test_score_table(self):
        table, _ = ev.gen_score_table(
            {1: {'add(-s)_0.10': 0.5, 'add_0.10': 0.4}}, dataset_name='lmo')
        assert 'ape' in table and '50.00' in table


class TestEvaluatorEndToEnd:
    def test_synthetic_gt_scores_one(self, tmp_path):
        root = str(tmp_path)
        flist = synthetic.generate_dataset(root, n_images=5, split='test_syn',
                                           seed=3, list_name='l.txt')
        evaluator = ev.Evaluator([flist], root, 'synthetic', obj_ids=[1],
                                 visib_fract_th=0)
        # feed GT poses as estimates: score must be 1.0
        results = []
        for g in evaluator.gts:
            results.append(dict(scene_id=g['scene_id'], im_id=g['im_id'],
                                obj_id=g['obj_id'], R_est=g['R_gt'],
                                t_est=g['t_gt']))
        per_obj, errors = evaluator.evaluate(results)
        assert per_obj[1]['add(-s)_0.10'] == 1.0
        # unmatched results count as misses
        per_obj2, _ = evaluator.evaluate(results[:2])
        assert per_obj2[1]['add(-s)_0.10'] == pytest.approx(2 / 5)

    def test_bop_scores_optional(self, tmp_path):
        """bop=True adds mssd/mspd per error and BOP'19 ARs per object;
        GT-as-estimate gives zero errors and AR=1."""
        root = str(tmp_path)
        flist = synthetic.generate_dataset(root, n_images=4, split='test_syn',
                                           seed=3, list_name='l.txt',
                                           symmetric=True)
        evaluator = ev.Evaluator([flist], root, 'synthetic_sym', obj_ids=[1],
                                 visib_fract_th=0)
        results = [dict(scene_id=g['scene_id'], im_id=g['im_id'],
                        obj_id=g['obj_id'], R_est=g['R_gt'], t_est=g['t_gt'])
                   for g in evaluator.gts]
        per_obj, errors = evaluator.evaluate(results, bop=True)
        assert all(e['mssd'] < 1e-3 and e['mspd'] < 1e-3 for e in errors)
        assert per_obj[1]['bop_mssd_ar'] == 1.0
        assert per_obj[1]['bop_mspd_ar'] == 1.0
        # symmetry-aware: a 180° flip about the symmetry axis is a zero-mssd
        # pose for this object but a large plain-ADD pose
        info = evaluator.models_info[1]
        sym = np.asarray(info['symmetries_discrete'][0]).reshape(4, 4)
        flipped = [dict(r, R_est=np.asarray(r['R_est']) @ sym[:3, :3],
                        t_est=r['t_est']) for r in results]
        per_obj_f, errors_f = evaluator.evaluate(flipped, bop=True)
        assert all(e['mssd'] < 1e-2 for e in errors_f)
        assert per_obj_f[1]['bop_mssd_ar'] == 1.0

    def test_sym_transforms_semantics(self, tmp_path):
        """_sym_transforms matches the BOP toolkit composition rules
        (pysixd/misc.py:206-254): identity first, continuous offset handling
        t = offset − R·offset, and discrete∘continuous composition."""
        root = str(tmp_path)
        flist = synthetic.generate_dataset(root, n_images=1, split='t',
                                           seed=0, list_name='l.txt')
        evaluator = ev.Evaluator([flist], root, 'synthetic',
                                 visib_fract_th=0)
        # inject a continuous z-symmetry with an offset
        evaluator.models_info[1] = dict(
            evaluator.models_info[1],
            symmetries_continuous=[dict(axis=[0, 0, 1], offset=[5.0, 0, 0])])
        Rs, ts = evaluator._sym_transforms(1, max_sym_disc_step=np.pi / 4)
        # pysixd composes disc (here: identity only) with cont steps i=1..3 —
        # the pure identity is NOT in the set when continuous syms exist
        # (misc.py:238-246,252); at the standard 0.01 step this is immaterial
        assert Rs.shape == (3, 3, 3)
        off = np.array([5.0, 0, 0])
        for R, t in zip(Rs, ts):
            np.testing.assert_allclose(t, off - R @ off, atol=1e-5)
            # rotation about z: axis preserved
            np.testing.assert_allclose(R @ np.array([0, 0, 1.0]),
                                       [0, 0, 1.0], atol=1e-6)


class TestGenZCLI:
    def test_reference_form_regenerates_z_crop(self, tmp_path, monkeypatch):
        """`gen_z.py --dataset ... --data_dir <split_dir> --scene N` (the
        reference CLI, tools/gen_z.py:192-226) reproduces the loader-consumed
        z_crop blobs on the synthetic dataset."""
        import gzip
        import pickle
        import shutil
        import subprocess
        import sys
        root = str(tmp_path)
        synthetic.generate_dataset(root, n_images=2, split='train_syn', seed=0)
        split_dir = osp.join(root, 'train_syn')
        orig = sorted(os.listdir(osp.join(split_dir, 'z_crop', '000001')))
        with gzip.open(osp.join(split_dir, 'z_crop', '000001', orig[0])) as f:
            golden = pickle.load(f)
        shutil.rmtree(osp.join(split_dir, 'z_crop'))
        out = subprocess.run(
            [sys.executable, osp.join(osp.dirname(__file__), '..', 'tools',
                                      'gen_z.py'),
             '--data_dir', split_dir, '--scene', '1'],
            capture_output=True, text=True, env={**os.environ,
                                                 'JAX_PLATFORMS': 'cpu'})
        assert out.returncode == 0, out.stderr
        regen = sorted(os.listdir(osp.join(split_dir, 'z_crop', '000001')))
        assert regen == orig
        with gzip.open(osp.join(split_dir, 'z_crop', '000001', regen[0])) as f:
            blob = pickle.load(f)
        assert set(blob) == set(golden)
        # same bbox; depth within the uint16 quantization of the rasterizer
        assert tuple(blob['xyxy']) == tuple(golden['xyxy'])
        assert abs(blob['z_min'] - golden['z_min']) < 1.0
        assert abs(blob['z_max'] - golden['z_max']) < 1.0


class TestMeshRasterizer:
    def test_box_mesh_depth_matches_raycast(self, tmp_path):
        # build a box mesh (12 triangles), rasterize, compare with analytic raycast
        he = np.array([40.0, 30.0, 20.0], np.float32)
        corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                            for sz in (-1, 1)], np.float32) * he
        faces = []
        quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
                 (0, 2, 6, 4), (1, 5, 7, 3)]
        for a, b, c, d in quads:
            faces += [(a, b, c), (a, c, d)]
        faces = np.asarray(faces, np.int64)

        K = synthetic.K_DEFAULT.astype(np.float64)
        R = sciR.random(random_state=1).as_matrix()
        t = np.array([0, 0, 700.0])
        depth = rasterize_depth(corners, faces, K, R, t)
        ref_depth, ref_mask, _ = synthetic.raycast_box(K, R, t, he)
        mask = depth > 0
        inter = mask & ref_mask
        assert inter.sum() > 0.95 * max(mask.sum(), ref_mask.sum())
        diff = np.abs(depth[inter] - ref_depth[inter])
        assert np.quantile(diff, 0.95) < 1.0  # < 1 mm on 95% of pixels

    def test_ply_roundtrip_ascii(self, tmp_path):
        he = np.array([10.0, 10.0, 10.0])
        verts = synthetic.box_surface_points(he)
        p = str(tmp_path / 'm.ply')
        synthetic._write_ply_ascii(p, verts)
        v2, f2 = load_ply_mesh(p)
        np.testing.assert_allclose(v2, verts, atol=1e-3)
        v3 = ev.load_ply_vertices(p)
        np.testing.assert_allclose(v3, verts, atol=1e-3)


class TestVis:
    def test_draw_overlays_and_colormaps(self):
        from scipy.spatial.transform import Rotation as sR
        from lc_tpu.utils import vis

        img = np.full((120, 160, 3), 32, np.uint8)
        K = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
        R = sR.random(random_state=2).as_matrix()
        t = np.array([0, 0, 600.0])
        he = np.array([40.0, 30.0, 20.0])
        corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                            for sz in (-1, 1)], np.float64) * he

        # projected corners land where project_points says they do
        uv = vis.project_points(corners, R, t, K)
        cam = corners @ R.T + t
        np.testing.assert_allclose(uv, cam[:, :2] / cam[:, 2:3] * 200.0
                                   + np.array([80.0, 60.0]), atol=1e-9)

        box = vis.draw_bbox3d(img, corners, R, t, K)
        axes = vis.draw_pose_axes(img, R, t, K, length=30.0)
        assert box.shape == img.shape and (box != img).any()
        assert (axes != img).any()
        assert (img == 32).all()  # inputs untouched (copies)

        rng = np.random.default_rng(7)
        noc = np.clip(rng.normal(size=(16, 16, 3)), -1, 1)
        msk = rng.random((16, 16)) > 0.5
        rgb = vis.noc_to_rgb(noc, msk)
        assert rgb.dtype == np.uint8
        assert (rgb[~msk] == 0).all() and (rgb[msk].sum() > 0)

        hm = vis.weight_heatmap(rng.random((16, 16)))
        assert hm.shape == (16, 16, 3) and hm.dtype == np.uint8

        ov = vis.overlay_mask(img, rng.random(img.shape[:2]) > 0.5)
        assert ov.shape == img.shape and ov.dtype == np.uint8


class TestCheckpoint:
    def test_rotation_and_best(self, tmp_path):
        ck = Checkpoint(str(tmp_path / 'ck'), latest_keep=2, best_keep=2)
        state = {'w': np.arange(4.0)}
        for step, score in ((1, -1), (2, 0.3), (3, -1), (4, 0.5), (5, 0.2)):
            ck.save({'w': np.arange(4.0) + step}, step=step, score=score)
        latest = ck.list_ckpts()
        assert len(latest) == 2 and latest[0].startswith('000000005')
        best = sorted((tmp_path / 'ck' / 'best').iterdir())
        assert len(best) == 2
        st, aux = ck.resume(state)
        assert aux['step'] == 5
        np.testing.assert_allclose(st['w'], np.arange(4.0) + 5)

    def test_resume_skips_corrupt(self, tmp_path):
        ck = Checkpoint(str(tmp_path / 'ck'), latest_keep=3)
        ck.save({'w': np.ones(2)}, step=1)
        ck.save({'w': np.full(2, 2.0)}, step=2)
        # corrupt the newest
        with open(tmp_path / 'ck' / '000000002.ckpt', 'wb') as f:
            f.write(b'garbage')
        st, aux = ck.resume({'w': np.zeros(2)})
        assert aux['step'] == 1
        np.testing.assert_allclose(st['w'], 1.0)

    def test_finish_exports(self, tmp_path):
        ck = Checkpoint(str(tmp_path / 'ck'))
        ck.save({'w': np.ones(2)}, step=10, score=0.9)
        ck.finish({'w': np.ones(2)}, str(tmp_path / 'final.ckpt'),
                  str(tmp_path / 'best'))
        assert (tmp_path / 'final.ckpt').exists()
        assert any(p.name.startswith('best_10_') for p in tmp_path.iterdir())
        assert ck.list_ckpts() == []


class TestPreflight:
    """tools/preflight.py — the real-data runbook's step-0 check (PARITY.md
    RUNBOOK), dry-run on the synthetic BOP tree."""

    def _tool(self):
        import importlib.util
        import os.path as osp
        path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                        'tools', 'preflight.py')
        spec = importlib.util.spec_from_file_location('preflight', path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_synthetic_tree_passes(self, tmp_path):
        pf = self._tool()
        root = str(tmp_path / 'bop')
        synthetic.generate_dataset(root, n_images=3, split='train_syn', seed=0)
        synthetic.generate_dataset(root, n_images=2, split='test_syn', seed=5,
                                   list_name='test_list.txt')
        cfg = synthetic.default_train_cfg(root)
        rep = pf.preflight(cfg, obj_ids=[1])
        assert rep.n_missing_required == 0, [r for r in rep.rows if not r[0]]

    def test_reports_missing_pieces(self, tmp_path):
        """Delete z_crop + the eval mesh: both must surface as REQUIRED-missing
        (z_crop because the config trains with a pose/NOC loss)."""
        import os
        import shutil
        pf = self._tool()
        root = str(tmp_path / 'bop')
        synthetic.generate_dataset(root, n_images=3, split='train_syn', seed=0)
        synthetic.generate_dataset(root, n_images=2, split='test_syn', seed=5,
                                   list_name='test_list.txt')
        shutil.rmtree(os.path.join(root, 'train_syn', 'z_crop'))
        os.remove(os.path.join(root, 'models_eval', 'obj_000001.ply'))
        cfg = synthetic.default_train_cfg(root)
        rep = pf.preflight(cfg, obj_ids=[1])
        missing = [r[2] for r in rep.rows if not r[0] and r[1]]
        assert any('z_crop' in m for m in missing), missing
        assert any('eval mesh' in m for m in missing), missing
        assert rep.n_missing_required == 2, missing

    def test_cli_exit_codes(self, tmp_path):
        import subprocess
        import sys as _sys
        import os.path as osp
        repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
        root = str(tmp_path / 'bop')
        synthetic.generate_dataset(root, n_images=2, split='train_syn', seed=0)
        synthetic.generate_dataset(root, n_images=2, split='test_syn', seed=5,
                                   list_name='test_list.txt')
        import yaml

        def plain(v):
            if isinstance(v, dict):
                return {k: plain(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [plain(x) for x in v]
            return v

        cfg = synthetic.default_train_cfg(root)
        cfg_path = str(tmp_path / 'syn.yaml')
        with open(cfg_path, 'w') as f:
            yaml.safe_dump(plain(cfg), f)
        env = dict(os.environ, JAX_PLATFORMS='cpu')
        r = subprocess.run([_sys.executable,
                            osp.join(repo, 'tools', 'preflight.py'),
                            '--config', cfg_path, '--obj', '1'],
                           capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stdout + r.stderr
        r2 = subprocess.run([_sys.executable,
                             osp.join(repo, 'tools', 'preflight.py'),
                             '--config', osp.join(repo, 'configs/glmo.yaml'),
                             '--obj', '1'],
                            capture_output=True, text=True, env=env,
                            cwd=str(tmp_path))  # no datasets/ tree here
        assert r2.returncode == 1, r2.stdout + r2.stderr
        assert 'MISSING' in r2.stdout
