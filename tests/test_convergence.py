"""Learning-signal tests: the from-scratch loss stack actually LEARNS.

Each path (dense CDPN, zebra binary-code, sparse keypoint) overfits the tiny
synthetic dataset for ~100 steps and must show (a) loss_pose decreasing and
(b) the evaluated pose error beating the step-0 model. The reference has no
equivalent (its only test is full-dataset training); these are the cheapest
end-to-end correctness signal for the LC loss + target-synthesis machinery.

All seeds are fixed, so the trajectories (and the asserted margins, which carry
~30% headroom over measured values) are deterministic per platform.
"""
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lc_tpu import harness
from lc_tpu.data import synthetic
from lc_tpu.data.pipeline import device_preprocess
from lc_tpu.train import build_training, eval_variables

pytestmark = pytest.mark.slow  # 150-step training convergence runs per family


def _run(cfg, n_steps, err_key='add'):
    comps = build_training(cfg, seed=0)
    state = comps['state']

    def mean_err(state):
        res = harness.run_test(cfg, comps['model'], eval_variables(state),
                               comps['test_loader'], comps['test_set'],
                               comps['evaluator'])
        errs = res.get('weighted', next(iter(res.values())))['errors']
        return float(np.mean([e[err_key] for e in errs]))

    err0 = mean_err(state)
    key = jax.random.PRNGKey(0)
    it = iter(comps['train_loader'])
    hist = []
    for _ in range(n_steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(comps['train_loader'])
            batch = next(it)
        key, k_pp, k_step = jax.random.split(key, 3)
        gt = device_preprocess({k: jnp.asarray(v) for k, v in batch.items()},
                               k_pp, **comps['pp_kwargs'])
        state, metrics = comps['step_fn'](state, gt, k_step)
        hist.append(metrics)
    hist = [{k: float(v) for k, v in h.items()} for h in hist]
    err1 = mean_err(state)
    return hist, err0, err1


def _pose_curve(hist):
    lp = [h['loss_pose'] for h in hist]
    return float(np.mean(lp[3:8])), float(np.mean(lp[-5:]))


class TestDenseConvergence:
    def test_overfit_reduces_pose_loss_and_add(self, tmp_path):
        root = str(tmp_path)
        synthetic.generate_dataset(root, n_images=8, split='train_syn', seed=0)
        synthetic.generate_dataset(root, n_images=6, split='test_syn', seed=5,
                                   list_name='test_list.txt')
        from test_integration import make_cfg
        cfg = make_cfg(root)
        cfg.optimizer.lr = 2e-3
        cfg.train_dataset.pixel_aug_prob = 0.0
        cfg.train_dataset.rotate_prob = 0.0
        hist, add0, add1 = _run(cfg, 150)
        early, late = _pose_curve(hist)
        # 100 steps was decisive on the strided stem (ADD 687->447) but within
        # fp-reassociation chaos of the margin on the space-to-depth stem
        # (679->554 at the same seeds: identical math, different bf16 sum
        # order). 150 steps separates trajectory noise from learning signal.
        assert late < 0.8 * early, (early, late)
        assert add1 < 0.8 * add0, (add0, add1)
        ln = [h['loss_noc'] for h in hist]
        assert np.mean(ln[-5:]) < np.mean(ln[:5])


class TestZebraConvergence:
    def test_overfit_reduces_pose_loss_and_adi(self, tmp_path):
        root = str(tmp_path)
        synthetic.generate_dataset(root, n_images=8, split='train_syn',
                                   seed=0, symmetric=True)
        synthetic.generate_dataset(root, n_images=8, split='train_pbr',
                                   seed=7, symmetric=True,
                                   list_name='pbr_list.txt')
        synthetic.generate_dataset(root, n_images=4, split='test_syn', seed=5,
                                   symmetric=True, list_name='test_list.txt')
        from test_integration_zebra import make_cfg
        cfg = make_cfg(root)
        cfg.optimizer.lr = 2e-3
        cfg.train_dataset.pixel_aug_prob = 0.0
        hist, adi0, adi1 = _run(cfg, 60, err_key='adi')
        early, late = _pose_curve(hist)
        # measured at 80 steps (fixed seeds): loss_pose 10.0 -> 5.5,
        # loss_seg 0.38 -> 0.035, loss_noc_bin 0.69 -> 0.66. The decoded-ADI
        # improvement needs O(1k) steps (the Gray-code bits must beat the
        # per-axis quantization before PnP benefits) — the dense test carries
        # the eval-improvement assertion; here the loss trajectory is the signal.
        assert late < 0.8 * early, (early, late)
        ls = [h['loss_seg'] for h in hist]
        assert np.mean(ls[-5:]) < 0.5 * np.mean(ls[3:8])
        lb = [h['loss_noc_bin'] for h in hist]
        assert np.mean(lb[-5:]) < np.mean(lb[:5])
        assert np.isfinite(adi0) and np.isfinite(adi1)


class TestSparseConvergence:
    def test_overfit_reduces_pose_loss_and_add(self, tmp_path):
        import pickle
        root = str(tmp_path)
        synthetic.generate_dataset(root, n_images=4, split='train_syn', seed=0)
        synthetic.generate_dataset(root, n_images=4, split='test_syn', seed=5,
                                   list_name='test_list.txt')
        pts = synthetic.box_surface_points(np.array([40.0, 30.0, 20.0]), 16)
        with open(osp.join(root, 'fps.pkl'), 'wb') as f:
            pickle.dump({1: pts[:256].astype(np.float32)}, f)
        from test_integration_sparse import make_cfg
        cfg = make_cfg(root)
        # single-batch memorization: 4 images, batch 4, no DZI jitter — the
        # softargmax keypoint head needs identical crops to overfit in ~100
        # steps (with jitter it needs thousands); keypoints first, pose loss
        # ramps in at step 60
        cfg.optimizer = dict(type='adam', lr=3e-3, wd=0.0)
        cfg.scheduler = dict(name='none')
        cfg.dataloader.num_workers = 4
        cfg.loss.pose_loss_start_step = 60
        cfg.loss.w_loss_pose = 0.3
        cfg.train_dataset.pixel_aug_prob = 0.0
        cfg.train_dataset.rotate_prob = 0.0
        cfg.train_dataset.dzi_scale_ratio = 0.0
        cfg.train_dataset.dzi_shift_ratio = 0.0
        hist, add0, add1 = _run(cfg, 120)
        # measured (fixed seeds): loss_kpts 1.97 -> -0.9 (Laplace NLL),
        # loss_pose 4.1 (steps 62-72, post-activation) -> 3.7 (ADD falls from
        # ~1e6mm untrained-softargmax garbage to <150mm). The pose check is an
        # ABSOLUTE decrease: the LC loss is log-scaled with a data-dependent
        # floor (its value at activation depends on how converged the keypoint
        # head already is — fp-reassociation-level changes move it), so a
        # fixed-ratio bound flaps with the trajectory while a margin on the
        # decrease does not (measured Δ0.39; asserted 0.2).
        lk = [h['loss_kpts'] for h in hist]
        assert np.mean(lk[-10:]) < 0.5 * np.mean(lk[3:8])
        lp = [h['loss_pose'] for h in hist]
        assert np.mean(lp[-10:]) < np.mean(lp[62:72]) - 0.2, \
            (np.mean(lp[62:72]), np.mean(lp[-10:]))
        assert add1 < 0.1 * add0, (add0, add1)
