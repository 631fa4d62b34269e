"""End-to-end: synthetic BOP dataset -> train steps -> inference -> evaluation.

Exercises the full slice the reference exercises via train.py/test.py: data
pipeline, model, on-the-fly targets, LC loss, optimizer, PnP solving, ADD scoring,
checkpoint save/resume.
"""
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lc_tpu import harness
from lc_tpu.data import synthetic
from lc_tpu.data.pipeline import device_preprocess
from lc_tpu.utils.checkpoint import Checkpoint


@pytest.fixture(scope='module')
def syn_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('bop_e2e'))
    synthetic.generate_dataset(root, n_images=12, split='train_syn', seed=0)
    synthetic.generate_dataset(root, n_images=6, split='test_syn', seed=5,
                               list_name='test_list.txt')
    return root


def make_cfg(root, **overrides):
    # canonical synthetic experiment config lives with the dataset generator
    return synthetic.default_train_cfg(root, **overrides)


class TestEndToEnd:
    @pytest.mark.slow  # 250s; TestEpochModeCLI is the quick-lane end-to-end guard
    def test_train_steps_and_eval(self, syn_root, tmp_path):
        cfg = make_cfg(syn_root)
        from lc_tpu.train import build_training, eval_variables
        comps = build_training(cfg, seed=0)
        state = comps['state']
        key = jax.random.PRNGKey(0)
        it = iter(comps['train_loader'])
        losses = []
        for _ in range(3):
            batch = next(it)
            key, k_pp, k_step = jax.random.split(key, 3)
            gt = device_preprocess(
                {k: jnp.asarray(v) for k, v in batch.items()}, k_pp,
                **comps['pp_kwargs'])
            state, metrics = comps['step_fn'](state, gt, k_step)
            total = sum(float(v) for k, v in metrics.items()
                        if k.startswith('loss'))
            assert np.isfinite(total), metrics
            losses.append({k: float(v) for k, v in metrics.items()})
        assert int(state.step) == 3
        # grad-clip EMA threshold got seeded
        assert float(state.loss_state.weight_clip.max_norm) > 0

        # inference + evaluation completes and returns the score dict
        res = harness.run_test(cfg, comps['model'], eval_variables(state),
                               comps['test_loader'], comps['test_set'],
                               comps['evaluator'])
        assert 'weighted' in res
        assert 'add(-s)_0.10' in next(iter(res['weighted']
                                           ['per_obj_score'].values()))

        # checkpoint save / resume roundtrip
        ck = Checkpoint.by_step(str(tmp_path / 'ckpts'), resume_period=1)
        ck.save(state, step=3, score=0.5)
        state2, aux = ck.resume(comps['state'])
        assert aux['step'] == 3
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(state2.params)[0]),
            np.asarray(jax.tree.leaves(state.params)[0]))


class TestEpochModeCLI:
    def test_epoch_loop_with_intraining_eval(self, syn_root, tmp_path):
        """Epoch-based training (reference train_by_epoch, train.py:23-81):
        num_steps derives from epochs × loader length, the in-training eval
        fires at the test_every cadence, and the best checkpoint is selected
        on the eval score."""
        import argparse
        import os.path as osp
        from lc_tpu import train as train_mod

        cfg = make_cfg(syn_root)
        del cfg.train['num_steps']
        cfg.train.num_epochs = 2
        cfg.train.test_every = 1       # evaluate after every epoch
        cfg.train.ckpt_every = 1
        outdir = str(tmp_path / 'out')
        args = argparse.Namespace(resume=False, ckpt=None)
        metrics = []
        state = train_mod.train(args, cfg, outdir, mesh=None,
                                record_metrics=metrics)
        # 12 train images / batch 4 = 3 steps per epoch, 2 epochs
        assert len(metrics) == 6
        assert int(state.step) == 6
        # in-training eval ran (scores land in TB; best ckpt carries the score)
        best = [f for f in __import__('os').listdir(
            osp.join(outdir, 'ckpts', 'best'))] if osp.isdir(
            osp.join(outdir, 'ckpts', 'best')) else []
        finals = __import__('os').listdir(outdir)
        assert 'model_final.ckpt' in finals
        assert any(f.startswith('model_best') for f in finals) or best
