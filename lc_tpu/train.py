"""Training entry point. CLI mirrors reference train.py:153-179:

    python -m lc_tpu.train --config configs/glmo.yaml --output out [--obj 1]
        [--name exp] [--ckpt path] [--resume] [--opts a.b=c ...]

Epoch-based (cfg.train.num_epochs) or step-based (cfg.train.num_steps) loops with
periodic in-training evaluation and best-checkpoint selection on add(-s)_0.10.
"""
from __future__ import annotations

import argparse
import logging
import os
import os.path as osp
import time

import numpy as np
import jax
import jax.numpy as jnp

from . import harness
from .data.pipeline import device_preprocess
from .optim.factory import build_optimizer
from .parallel.mesh import auto_mesh, is_primary, maybe_init_distributed, \
    replicate, shard_batch
from .parallel.train_step import create_train_state, make_train_step
from .utils.checkpoint import Checkpoint
from .utils.config import load_config
from .utils.logging import setup_logger

logger = logging.getLogger(__name__)


def build_training(cfg, seed: int | None = None):
    """Wire everything; returns a dict of components. seed defaults to
    cfg.train.seed (42 when unset) — one knob drives loader shuffling, model
    init, and the per-step fold_in stream."""
    if seed is None:
        seed = int(cfg.train.get('seed', 42))
    train_set, train_loader = harness.make_datasets(cfg, train=True, seed=seed)
    test_set, test_loader = harness.make_datasets(cfg, train=False, seed=seed)
    evaluator = harness.get_evaluator(cfg)

    bit_cnt = train_set.bit_cnt
    total_bits = 0 if bit_cnt is None else sum(bit_cnt)
    model = harness.build_model_from_cfg(cfg, total_bits)

    if cfg.train.get('num_steps'):
        num_steps = cfg.train.num_steps
        steps_per_epoch = 0
    else:
        steps_per_epoch = len(train_loader)
        num_steps = cfg.train.num_epochs * steps_per_epoch

    loss_cfg = harness.make_loss_config(cfg, steps_per_epoch, bit_cnt)
    tx = build_optimizer(cfg.optimizer, cfg.scheduler, num_steps)

    in_w, in_h = train_set.net_input_wh
    sample = jnp.zeros((1, in_h, in_w, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(seed), sample,
                               loss_cfg)
    step_fn = make_train_step(model, tx, loss_cfg,
                              sym_aware_start=cfg.get('sym_aware_start', 0))
    pp_kwargs = harness.preprocess_kwargs(cfg, train_set, train=True)
    return dict(model=model, state=state, step_fn=step_fn, tx=tx,
                loss_cfg=loss_cfg, train_set=train_set,
                train_loader=train_loader, test_set=test_set,
                test_loader=test_loader, evaluator=evaluator,
                pp_kwargs=pp_kwargs, num_steps=num_steps,
                steps_per_epoch=steps_per_epoch, bit_cnt=bit_cnt)


def eval_variables(state):
    return {'params': state.params, 'batch_stats': state.batch_stats}


def train(args, cfg, outdir: str, mesh='auto', record_metrics=None):
    """The production loop. `mesh`: 'auto' builds the all-device data-parallel
    mesh when >1 device is visible (batch sharded over 'data', params/optimizer
    replicated, gradient all-reduce over ICI inserted by the SPMD partitioner);
    None forces single-device; a Mesh instance is used as-is.
    `record_metrics`: optional list — every step's metrics dict (device scalars,
    no sync) is appended, for tests that compare sharded vs single-device runs."""
    import tensorboardX
    comps = build_training(cfg)
    model, state, step_fn = comps['model'], comps['state'], comps['step_fn']
    num_steps = comps['num_steps']
    pp_kwargs = comps['pp_kwargs']

    if mesh == 'auto':
        mesh = auto_mesh()
    if mesh is not None:
        n_dev = mesh.devices.size
        batch_size = cfg.dataloader.batch_size
        assert batch_size % n_dev == 0, (
            f'batch_size {batch_size} not divisible by {n_dev} devices')
        logger.info('data-parallel over %d devices (%s), %d crops/device',
                    n_dev, mesh.devices.flat[0].platform, batch_size // n_dev)

    # multi-process: only process 0 writes files (TB, checkpoints, exports)
    primary = is_primary()
    writer = tensorboardX.SummaryWriter(outdir) if primary else None
    ckpter = Checkpoint.by_step(
        osp.join(outdir, 'ckpts'),
        resume_period=cfg.train.get('ckpt_every',
                                    comps['steps_per_epoch'] or 5000))
    start_step = 0
    if args.resume or args.ckpt:
        state, aux = ckpter.resume(state, ckpt_path=args.ckpt)
        start_step = int(aux.get('step', 0))
        logger.info('resumed from step %d', start_step)
    if mesh is not None:
        state = replicate(mesh, state)
    if start_step >= num_steps:
        return state

    from .utils.seeding import seed_all, step_key
    root_key = seed_all(int(cfg.train.get('seed', 42)))
    test_every = cfg.train.get('test_every', 0)
    test_start = cfg.train.get('test_start', 0)
    # test cadence is per-epoch for epoch mode, per-step for step mode
    per_epoch = bool(cfg.train.get('num_epochs'))
    test_every_steps = (test_every * comps['steps_per_epoch']
                        if per_epoch else test_every)

    step = start_step
    t0 = time.time()

    def endless_batches():
        # resume continues the deterministic shuffle stream at batch start_step
        # (reference restores DataLoader RNG state on resume; here the stream is
        # a pure function of (seed, position) so the position alone suffices)
        loader = comps['train_loader']
        if hasattr(loader, 'endless'):  # MPLoader: stream across epoch boundaries
            yield from loader.endless(start=start_step)
            return
        if hasattr(loader, 'set_position'):
            loader.set_position(start_step)
        while True:
            for b in loader:
                yield b

    def pp_keys():
        # per-step keys derived from the step index: identical streams on resume
        s = start_step
        while True:
            yield jax.random.split(step_key(root_key, s))[0]
            s += 1

    from .data.pipeline import device_prefetch
    place = None
    if mesh is not None:
        from .parallel.mesh import shard_local_batch
        if getattr(comps['train_loader'], 'process_count', 1) > 1:
            # shard-aware loaders: each host decoded only its own rows
            place = (lambda b: shard_local_batch(mesh, b))
        else:
            place = (lambda b: shard_batch(mesh, b))
    gt_iter = device_prefetch(
        endless_batches(),
        lambda dev, k: device_preprocess(dev, k, **pp_kwargs),
        keys=pp_keys(), size=2, place=place)

    while step < num_steps:
        gt = next(gt_iter)
        k_step = jax.random.split(step_key(root_key, step))[1]
        state, metrics = step_fn(state, gt, k_step)
        if record_metrics is not None:
            record_metrics.append(metrics)
        step += 1

        if step % 20 == 0 or step == 1:
            m = {k: float(v) for k, v in metrics.items()}
            rate = 20 * gt['out_K'].shape[0] / max(time.time() - t0, 1e-9)
            t0 = time.time()
            logger.info('step %d/%d  %s  (%.1f crops/s)', step, num_steps,
                        ' '.join(f'{k}={v:.4f}' for k, v in m.items()), rate)
            if primary:
                for k, v in m.items():
                    writer.add_scalar(f'loss/{k}', v, step)

        score = -1.0
        if test_every_steps and step % test_every_steps == 0 \
                and step >= test_start and step != num_steps:
            res = harness.run_test(cfg, model, eval_variables(state),
                                   comps['test_loader'], comps['test_set'],
                                   comps['evaluator'], mesh=mesh)
            score = next(iter(res.values()))['avg_score']
            if primary:
                writer.add_scalar('eval/score', score, step)
        if primary:
            ckpter.step(state, step=step, score=score)

    if not primary:
        return state
    ckpter.save(state, step=step, score=-1.0)
    # final exports are plain {'params','batch_stats'} variables — lc_tpu.test
    # loads them without reconstructing the optimizer (reference exports the
    # model-only state dict too, checkpoint.py:251 finalize_model)
    ckpter.finish(eval_variables(state), osp.join(outdir, 'model_final.ckpt'),
                  osp.join(outdir, 'model_best'))
    return state


def main(argv=None):
    maybe_init_distributed()
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', type=str, default='configs/glmo.yaml')
    parser.add_argument('--output', type=str, default='output')
    parser.add_argument('--name', type=str)
    parser.add_argument('--obj', type=int, nargs='+')
    parser.add_argument('--ckpt', type=str)
    parser.add_argument('--resume', action='store_true')
    parser.add_argument('--opts', nargs='+')
    args = parser.parse_args(argv)

    cfg = load_config(args.config, args.opts)
    if args.name:
        cfg['exp_name'] = args.name
    if args.obj is not None:
        cfg.obj_ids = args.obj

    outdir = osp.join(args.output, cfg.exp_name) + '-' + \
        '_'.join(map(str, cfg.obj_ids))
    os.makedirs(outdir, exist_ok=True)
    setup_logger(outdir)

    assert bool(cfg.train.get('num_epochs')) != bool(cfg.train.get('num_steps'))
    np.random.seed(int(cfg.train.get('seed', 42)))
    train(args, cfg, outdir)


if __name__ == '__main__':
    main()
