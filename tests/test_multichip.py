"""Multi-device sharding: the full training step over an 8-device CPU mesh."""
import numpy as np
import jax
import pytest


def test_eight_devices_available():
    assert jax.device_count() >= 8


@pytest.mark.slow  # heavy 8-dev run; sharded_batch/entry_compiles stay quick-lane
def test_dryrun_multichip_8():
    import sys
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


@pytest.fixture(scope='module')
def syn_root(tmp_path_factory):
    from lc_tpu.data import synthetic
    root = str(tmp_path_factory.mktemp('bop_mc'))
    synthetic.generate_dataset(root, n_images=16, split='train_syn', seed=0)
    synthetic.generate_dataset(root, n_images=6, split='test_syn', seed=5,
                               list_name='test_list.txt')
    return root


def _cfg(root, **overrides):
    from test_integration import make_cfg
    cfg = make_cfg(root, **overrides)
    cfg.dataloader.batch_size = 8
    return cfg


@pytest.mark.slow  # heavy 8-dev run; sharded_batch/entry_compiles stay quick-lane
def test_train_cli_sharded_matches_single_device(syn_root, tmp_path):
    """The PRODUCTION train loop on the 8-device mesh computes the same per-step
    losses as the single-device run (same data stream, same keys; the sharded
    program's all-reduced grads and cross-shard BN stats are mathematically the
    global-batch quantities).

    Tolerances: the sharded program compiles convs at local batch 1 vs 8, so
    f32 rounding differs at ~1e-4 rel on step-0 losses; the LC pose loss's
    Cholesky-solve gradient amplifies that (measured ~2% on grad_norm), and
    after an optimizer step the trajectories drift at the few-percent level.
    A mis-sharded batch would be O(1) wrong — that is what this guards."""
    import argparse
    from lc_tpu import train as train_mod
    from lc_tpu.parallel.mesh import make_mesh

    args = argparse.Namespace(resume=False, ckpt=None)
    m_single, m_mesh = [], []
    train_mod.train(args, _cfg(syn_root), str(tmp_path / 'single'),
                    mesh=None, record_metrics=m_single)
    train_mod.train(args, _cfg(syn_root), str(tmp_path / 'mesh'),
                    mesh=make_mesh(8), record_metrics=m_mesh)
    assert len(m_single) == len(m_mesh) == 3
    # divergence grows per optimizer step and is concentrated in the
    # ill-conditioned pose loss (measured: step0 ~2e-4, step1 ~1.2%, step2 ~6%);
    # the well-conditioned surrogate losses stay ~1e-3. A mis-sharded batch
    # would be O(1) wrong at step 0.
    pose_rtol = (1e-3, 5e-2, 1.5e-1)
    other_rtol = (1e-3, 1e-2, 3e-2)
    for step, (a, b) in enumerate(zip(m_single, m_mesh)):
        for k in a:
            if k == 'grad_norm':
                continue  # dominated by the ill-conditioned pose-grad noise
            rtol = (pose_rtol if k == 'loss_pose' else other_rtol)[step]
            np.testing.assert_allclose(float(a[k]), float(b[k]),
                                       rtol=rtol, atol=1e-4,
                                       err_msg=f'step{step} {k}')


@pytest.mark.slow  # heavy 8-dev run; sharded_batch/entry_compiles stay quick-lane
def test_run_test_sharded_matches_single_device(syn_root):
    """Sharded eval (padded batches over the mesh) returns the same per-object
    scores as the single-device pass."""
    from lc_tpu import harness
    from lc_tpu.train import build_training, eval_variables
    from lc_tpu.parallel.mesh import make_mesh

    cfg = _cfg(syn_root)
    comps = build_training(cfg, seed=0)
    variables = eval_variables(comps['state'])
    kw = dict(cfg=cfg, model=comps['model'], variables=variables,
              loader=comps['test_loader'], dataset=comps['test_set'],
              evaluator=comps['evaluator'])
    res_single = harness.run_test(**kw)
    res_mesh = harness.run_test(**kw, mesh=make_mesh(8))
    for name in res_single:
        e0 = res_single[name]['errors']
        e1 = res_mesh[name]['errors']
        assert len(e0) == len(e1)
        # local-batch-1 vs batch-8 conv compilation rounds differently, and on
        # untrained weights the RANSAC/LM solve amplifies that (measured ≤0.7%
        # on per-instance ADD); a mis-sharded batch would be O(100%) wrong
        np.testing.assert_allclose(
            [d['add'] for d in e0], [d['add'] for d in e1],
            rtol=0.03, atol=1.0)


@pytest.mark.slow  # heavy 8-dev run; sharded_batch/entry_compiles stay quick-lane
def test_run_test_int8_sharded_matches_single_device(syn_root):
    """int8_inference composed with the sharded eval path (harness.py:226 +
    the mesh branch): the quantized convs are a trace-time interception inside
    the sharded jit, and activation scales are per-SAMPLE (models/quant.py), so
    local-batch-1 vs batch-8 compilation is the only divergence source — the
    sharded int8 eval must agree with the single-device int8 eval to the same
    tolerance as the f32 pair above."""
    from lc_tpu import harness
    from lc_tpu.train import build_training, eval_variables
    from lc_tpu.parallel.mesh import make_mesh

    cfg = _cfg(syn_root)
    cfg['int8_inference'] = True
    comps = build_training(cfg, seed=0)
    variables = eval_variables(comps['state'])
    kw = dict(cfg=cfg, model=comps['model'], variables=variables,
              loader=comps['test_loader'], dataset=comps['test_set'],
              evaluator=comps['evaluator'])
    res_single = harness.run_test(**kw)
    res_mesh = harness.run_test(**kw, mesh=make_mesh(8))
    for name in res_single:
        e0 = res_single[name]['errors']
        e1 = res_mesh[name]['errors']
        assert len(e0) == len(e1)
        np.testing.assert_allclose(
            [d['add'] for d in e0], [d['add'] for d in e1],
            rtol=0.03, atol=1.0)


def test_entry_compiles():
    import sys
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (8, 64, 64, 3)


def test_sharded_batch_matches_single_device():
    """Inference math must be identical regardless of sharding."""
    import jax.numpy as jnp
    from lc_tpu.parallel.mesh import make_mesh, shard_batch
    from lc_tpu.pnp.solver import lm_refine
    from lc_tpu import geom
    from scipy.spatial.transform import Rotation as sciR

    rng = np.random.default_rng(0)
    B = 8
    K = np.broadcast_to(np.array([[500.0, 0, 128], [0, 500, 128], [0, 0, 1]],
                                 np.float32), (B, 3, 3))
    Rs = sciR.random(B, random_state=0).as_matrix().astype(np.float32)
    ts = np.concatenate((rng.uniform(-20, 20, (B, 2)),
                         rng.uniform(500, 700, (B, 1))), -1).astype(np.float32)
    pose = np.asarray(geom.RT_to_pose7(jnp.asarray(Rs), jnp.asarray(ts)))
    pts3d = rng.uniform(-30, 30, (B, 32, 3)).astype(np.float32)
    uv = np.asarray(geom.project_apply(jnp.asarray(K), jnp.asarray(pts3d),
                                       jnp.asarray(Rs), jnp.asarray(ts)))
    start = pose.copy()
    start[:, 4] += 5.0
    w = np.ones((B, 32, 2), np.float32)

    single = lm_refine(jnp.asarray(start), jnp.asarray(K), jnp.asarray(pts3d),
                       jnp.asarray(uv), jnp.asarray(w))
    mesh = make_mesh(8)
    with mesh:
        args = shard_batch(mesh, tuple(
            jnp.asarray(a) for a in (start, K, pts3d, uv, w)))
        sharded = jax.jit(lm_refine)(*args)
    np.testing.assert_allclose(np.asarray(sharded.pose7),
                               np.asarray(single.pose7), atol=1e-4)


@pytest.mark.slow  # heavy 8-dev run; sharded_batch/entry_compiles stay quick-lane
def test_run_test_int8_static_sharded_runs(syn_root):
    """int8_act_scales=static composed with the sharded eval path: the
    first-batch calibration (quant.calibrate_act_scales) runs on a SHARDED
    batch with replicated variables, and the resulting fixed scales bake into
    the sharded jit. Unlike the dynamic mode, static single-device vs sharded
    cannot be compared bitwise-tightly: the calibration batch differs (the
    mesh path pads the batch to a device multiple), so scales differ
    slightly. The check is that the mode runs SPMD end to end and lands
    within the int8-vs-f32 tolerance band of the single-device result."""
    from lc_tpu import harness
    from lc_tpu.train import build_training, eval_variables
    from lc_tpu.parallel.mesh import make_mesh

    cfg = _cfg(syn_root)
    cfg['int8_inference'] = True
    cfg['int8_act_scales'] = 'static'
    comps = build_training(cfg, seed=0)
    variables = eval_variables(comps['state'])
    kw = dict(cfg=cfg, model=comps['model'], variables=variables,
              loader=comps['test_loader'], dataset=comps['test_set'],
              evaluator=comps['evaluator'])
    res_single = harness.run_test(**kw)
    res_mesh = harness.run_test(**kw, mesh=make_mesh(8))
    for name in res_single:
        e0 = res_single[name]['errors']
        e1 = res_mesh[name]['errors']
        assert len(e0) == len(e1)
        a0 = np.asarray([d['add'] for d in e0])
        a1 = np.asarray([d['add'] for d in e1])
        assert np.all(np.isfinite(a1))
        # scales differ across the two calibrations (padded vs unpadded
        # first batch), so allow a wider band than the dynamic test; a
        # mis-sharded batch or broken scale plumbing is O(100%) off
        np.testing.assert_allclose(a1, a0, rtol=0.2, atol=3.0)
