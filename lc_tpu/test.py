"""Evaluation entry point. CLI mirrors reference test.py:210-268:

    python -m lc_tpu.test --weight ckpt --config configs/glmo.yaml \
        --output out --obj 1 [--opts ...] [--deterministic]
"""
from __future__ import annotations

import argparse
import logging
import os
import os.path as osp

import jax

from . import harness
from .parallel.mesh import auto_mesh, is_primary, maybe_init_distributed
from .utils.config import load_config
from .utils.logging import setup_logger
from .eval.evaluator import csv_from_results

logger = logging.getLogger(__name__)


def main(argv=None):
    maybe_init_distributed()  # must precede any backend initialization
    parser = argparse.ArgumentParser()
    parser.add_argument('--weight', type=str, required=True)
    parser.add_argument('--config', type=str, required=True)
    parser.add_argument('--output', type=str, required=True)
    parser.add_argument('--obj', type=int, nargs='+', required=True)
    parser.add_argument('--opts', nargs='+')
    parser.add_argument('--deterministic', action='store_true')
    args = parser.parse_args(argv)

    if not osp.exists(args.weight):
        raise SystemExit(f'weight file "{args.weight}" not found.')

    cfg_name = osp.splitext(osp.split(args.config)[1])[0]
    cfg = load_config(args.config, args.opts)
    cfg.obj_ids = args.obj

    os.makedirs(args.output, exist_ok=True)
    log_name = '_'.join([cfg_name, cfg.train_dataset.name, 'test',
                         ','.join(map(str, cfg.obj_ids)) + '.log'])
    setup_logger(osp.join(args.output, log_name))

    evaluator = harness.get_evaluator(cfg)
    test_set, test_loader = harness.make_datasets(cfg, train=False)
    bit_cnt = test_set.bit_cnt
    total_bits = 0 if bit_cnt is None else sum(bit_cnt)
    model = harness.build_model_from_cfg(cfg, total_bits)

    # template init to know the pytree structure, then load the weights
    import jax.numpy as jnp
    in_w, in_h = test_set.net_input_wh
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, in_h, in_w, 3)), train=False)

    if args.weight.endswith(('.pth', '.pt')):
        # reference-released torch weights (readme.md:68-70): auto-port through
        # torch_port, net architecture selected by the config
        from .models.torch_port import (load_torch_state_dict,
                                        port_cdpn_checkpoint,
                                        port_zebra_checkpoint)
        sd = load_torch_state_dict(args.weight)
        net = cfg.model.net_name
        if net == 'cdpn_resnet':
            concat = bool(cfg.model.get('net_config', {}).get('concat', False))
            params, stats = port_cdpn_checkpoint(sd, concat=concat)
        elif net == 'zebra_DeepLabV3':
            params, stats = port_zebra_checkpoint(sd)
        else:
            raise SystemExit(f'no torch checkpoint port for net_name={net}')
        ported = {'params': params, 'batch_stats': stats}
        # structural check against the config-built model before proceeding
        t_paths = {jax.tree_util.keystr(p) + str(jnp.shape(v)) for p, v in
                   jax.tree_util.tree_flatten_with_path(variables)[0]}
        p_paths = {jax.tree_util.keystr(p) + str(jnp.shape(v)) for p, v in
                   jax.tree_util.tree_flatten_with_path(ported)[0]}
        if t_paths != p_paths:
            diff = sorted(t_paths ^ p_paths)[:8]
            raise SystemExit(
                f'ported torch checkpoint does not match the configured '
                f'model (first mismatches: {diff})')
        variables = jax.tree.map(jnp.asarray, ported)
        logger.info('ported torch checkpoint %s (%s)', args.weight, net)
    else:
        from .utils.checkpoint import read_checkpoint, restore_state, state_keys
        blob = read_checkpoint(args.weight)   # one read: sniff + restore below
        keys = state_keys(blob)
        if 'opt_state' in keys:  # full TrainState checkpoint from lc_tpu.train
            from .optim.factory import build_optimizer
            tx = build_optimizer(cfg.optimizer, cfg.scheduler, 1)
            from .parallel.train_step import create_train_state
            from .harness import make_loss_config
            tmpl = create_train_state(
                model, tx, jax.random.PRNGKey(0),
                jnp.zeros((1, in_h, in_w, 3)),
                make_loss_config(cfg, 1, bit_cnt))
            state, _ = restore_state(blob, tmpl)
            variables = {'params': state.params,
                         'batch_stats': state.batch_stats}
        elif 'params' in keys:  # plain {'params','batch_stats'} export
            variables, _ = restore_state(blob, variables)
        else:
            raise SystemExit(
                f'unrecognized checkpoint payload in {args.weight}: '
                f'top-level fields {sorted(keys)}')

    if args.deterministic:
        # reference test.py:249-253: deterministic algorithms + cv2 RNG seed.
        # XLA is deterministic at fixed shapes; the remaining nondeterminism is
        # host-side (cv2 internals, numpy) — pin both, plus the solve PRNG seed.
        import cv2
        import numpy as np
        cv2.setRNGSeed(0)
        np.random.seed(0)

    results = harness.run_test(cfg, model, variables, test_loader, test_set,
                               evaluator, seed=0 if args.deterministic else 1,
                               mesh=auto_mesh())

    table = ''
    for name, res in results.items():
        table += '\n' + name + '\n' + res['tables'][0] + '\n'
    logger.info(table)

    if is_primary():
        for name, text in csv_from_results(results).items():
            csv_name = '_'.join([f'{cfg_name}-{name}',
                                 cfg.train_dataset.name, 'test',
                                 ','.join(map(str, cfg.obj_ids)) + '.csv'])
            with open(osp.join(args.output, csv_name), 'w') as f:
                f.write(text)
    return results


if __name__ == '__main__':
    main()
