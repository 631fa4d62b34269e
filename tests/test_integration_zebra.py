"""End-to-end zebra path: binary codec + ratio-mixed loaders + symmetry-aware
targets (the zlmo/zycbv-shaped configuration) on the synthetic dataset."""
import os.path as osp

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
    root = str(tmp_path_factory.mktemp('bop_zebra'))
    synthetic.generate_dataset(root, n_images=8, split='train_syn', seed=0,
                               symmetric=True)
    synthetic.generate_dataset(root, n_images=8, split='train_pbr', seed=7,
                               symmetric=True, list_name='pbr_list.txt')
    synthetic.generate_dataset(root, n_images=4, split='test_syn', seed=5,
                               symmetric=True, list_name='test_list.txt')
    return root


def make_cfg(root):
    return Config(dict(
        exp_name='zsyn', obj_ids=[1], cache_dir='',
        sym_aware=True, sym_aware_start=0, max_bit_cnt=5,
        black_background=True,
        net_input_wh=[64, 64], net_output_wh=[32, 32],
        dataloader=dict(batch_size=4, num_workers=1),
        train=dict(num_steps=2, test_every=0, ckpt_every=100),
        optimizer=dict(type='adam', lr=2e-4, wd=0.0),
        scheduler=dict(name='none'),
        pnp_solver=dict(seg_thresh=0.5, dense_sample=1, rel_reproj_err=True,
                        dense_point_select='quantile_in_mask', quantile=0.2,
                        solvers=['weighted_filtered']),
        train_dataset=dict(
            name='synthetic_sym', dataset_root=root,
            list_files=[osp.join(root, 'train_syn_list.txt')],
            mask_interp='nearest', visib_frac=0.1, pixel_aug_prob=0.8,
            rotate_prob=0, switch_bg_prob=0, dzi_scale_ratio=0.25,
            dzi_shift_ratio=0.25, dzi_pad_scale=1.5, valid_pix_cnt_th=30,
            use_peper_salt=True, use_motion_blur=True, use_invert=True),
        train_dataset_1=dict(
            name='synthetic_sym',
            list_files=[osp.join(root, 'pbr_list.txt')], ratio=0.5),
        test_dataset=dict(
            name='synthetic_sym', dataset_root=root, visib_frac=0.0,
            list_files=[osp.join(root, 'test_list.txt')], dzi_pad_scale=1.5),
        model=dict(net_name='zebra_DeepLabV3',
                   net_config=dict(back_layers_num=34, output_kernel_size=1,
                                   concat=True)),
        loss=dict(pose_loss_cfg=dict(dense_sample=3, clip_weight_grad=True),
                  seg_loss_type='L1', pose_loss_start_step=1,
                  w_loss_pose=0.03, w_loss_noc_bin=3, w_loss_seg=1),
    ))


@pytest.mark.slow  # 180s full zebra train+eval; zebra fwd/loss/quant stay quick-lane
class TestZebraEndToEnd:
    def test_train_steps_and_eval(self, syn_root):
        cfg = make_cfg(syn_root)
        from lc_tpu.train import build_training, eval_variables
        comps = build_training(cfg, seed=0)
        assert comps['bit_cnt'] is not None and len(comps['bit_cnt']) == 3
        # symmetric object: candidates padded to K=2 (identity + 180° z)
        assert comps['train_set'].max_candidates == 2

        state = comps['state']
        key = jax.random.PRNGKey(0)
        it = iter(comps['train_loader'])
        for step in range(2):
            batch = next(it)
            assert batch['Rt_candi'].shape[1] == 2  # ratio-mixed, padded
            key, k_pp, k_step = jax.random.split(key, 3)
            gt = device_preprocess(
                {k: jnp.asarray(v) for k, v in batch.items()}, k_pp,
                **comps['pp_kwargs'])
            state, metrics = comps['step_fn'](state, gt, k_step)
            for k, v in metrics.items():
                assert np.isfinite(float(v)), (k, metrics)
        assert {'loss_noc_bin', 'loss_seg', 'loss_pose'} <= set(metrics)
        # binary histogram EMA moved
        assert not np.allclose(np.asarray(state.loss_state.histogram), 0.5)

        res = harness.run_test(cfg, comps['model'], eval_variables(state),
                               comps['test_loader'], comps['test_set'],
                               comps['evaluator'])
        assert 'weighted-filtered' in res
