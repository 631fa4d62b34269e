"""End-to-end sparse-keypoint path (the gsplmo-shaped configuration): softargmax
head, Laplace NLL + sparse LC pose loss, RANSAC + weighted solve."""
import os.path as osp
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lc_tpu import harness
from lc_tpu.data import synthetic
from lc_tpu.data.pipeline import device_preprocess
from lc_tpu.utils.config import Config


@pytest.fixture(scope='module')
def syn_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('bop_sparse'))
    synthetic.generate_dataset(root, n_images=8, split='train_syn', seed=0)
    synthetic.generate_dataset(root, n_images=4, split='test_syn', seed=5,
                               list_name='test_list.txt')
    # FPS-style keypoints: surface samples of the box (reference assets/fps/*.pkl
    # maps obj_id -> (256, 3))
    pts = synthetic.box_surface_points(np.array([40.0, 30.0, 20.0]), 16)
    with open(osp.join(root, 'fps.pkl'), 'wb') as f:
        pickle.dump({1: pts[:256].astype(np.float32)}, f)
    return root


def make_cfg(root):
    return Config(dict(
        exp_name='spsyn', obj_ids=[1], cache_dir='', sym_aware=False,
        sparse_cnt=16, fps=osp.join(root, 'fps.pkl'),
        net_input_wh=[64, 64], net_output_wh=[16, 16],
        dataloader=dict(batch_size=4, num_workers=1),
        train=dict(num_steps=2, test_every=0),
        optimizer=dict(type='Ranger', lr=1e-4, wd=1e-4),
        scheduler=dict(name='flat_and_anneal', anneal_method='cosine',
                       warmup_method='linear', anneal_point=0.72,
                       rel_steps=[0.5, 0.75], warmup_factor=0.001,
                       warmup_iters=1, step_gamma=0.5),
        pnp_solver=dict(rel_reproj_err=False, solvers=['ransac', 'weighted']),
        train_dataset=dict(
            name='synthetic', dataset_root=root,
            list_files=[osp.join(root, 'train_syn_list.txt')],
            visib_frac=0.1, pixel_aug_prob=0.5, rotate_prob=0.5,
            switch_bg_prob=0, dzi_scale_ratio=0.25, dzi_shift_ratio=0.25,
            dzi_pad_scale=1.5, valid_pix_cnt_th=30),
        test_dataset=dict(
            name='synthetic', dataset_root=root, visib_frac=0.0,
            list_files=[osp.join(root, 'test_list.txt')], dzi_pad_scale=1.5),
        model=dict(net_name='cdpn_resnet',
                   net_config=dict(back_layers_num=34, concat=False)),
        loss=dict(pose_loss_cfg=dict(type='cov', clip_weight_grad=True),
                  pose_loss_start_step=1, w_loss_kpts=1, w_loss_pose=0.7),
    ))


@pytest.mark.slow  # 150s full sparse train+eval; sparse decode/solver stay quick-lane
class TestSparseEndToEnd:
    def test_train_and_eval(self, syn_root):
        cfg = make_cfg(syn_root)
        from lc_tpu.train import build_training, eval_variables
        comps = build_training(cfg, seed=0)
        state = comps['state']
        key = jax.random.PRNGKey(0)
        it = iter(comps['train_loader'])
        for _ in range(2):
            batch = next(it)
            assert batch['pts3d'].shape == (4, 16, 3)
            key, k_pp, k_step = jax.random.split(key, 3)
            gt = device_preprocess(
                {k: jnp.asarray(v) for k, v in batch.items()}, k_pp,
                **comps['pp_kwargs'])
            state, metrics = comps['step_fn'](state, gt, k_step)
            for k, v in metrics.items():
                assert np.isfinite(float(v)), (k, metrics)
        assert {'loss_kpts', 'loss_pose'} <= set(metrics)

        res = harness.run_test(cfg, comps['model'], eval_variables(state),
                               comps['test_loader'], comps['test_set'],
                               comps['evaluator'])
        assert {'ransac', 'weighted'} <= set(res)
