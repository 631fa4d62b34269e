"""Optimizer/schedule construction from config (reference utils.py:45-77)."""
from __future__ import annotations

import optax

from .ranger import ranger
from .schedule import flat_and_anneal_schedule


def build_schedule(cfg_sched: dict, total_iters: int):
    name = cfg_sched.get('name', 'none').lower()
    if name == 'flat_and_anneal':
        return flat_and_anneal_schedule(
            total_iters=total_iters,
            warmup_factor=cfg_sched.get('warmup_factor', 0.1),
            warmup_iters=cfg_sched.get('warmup_iters', 0),
            warmup_method=cfg_sched.get('warmup_method', 'linear'),
            anneal_method=cfg_sched.get('anneal_method', 'cosine'),
            anneal_point=cfg_sched.get('anneal_point', 0.72),
            steps=tuple(cfg_sched.get('rel_steps', (2 / 3.0, 8 / 9.0))),
            target_lr_factor=cfg_sched.get('target_lr_factor', 0.0),
            poly_power=cfg_sched.get('poly_power', 1.0),
            step_gamma=cfg_sched.get('step_gamma', 0.1))
    if name == 'none':
        return lambda count: 1.0
    raise ValueError(f'unknown scheduler {name}')


def build_optimizer(cfg_optim: dict, cfg_sched: dict, total_iters: int
                    ) -> optax.GradientTransformation:
    base_lr = cfg_optim['lr']
    wd = cfg_optim.get('wd', 0.0)
    factor = build_schedule(cfg_sched, total_iters)
    lr_fn = lambda step: base_lr * factor(step)  # noqa: E731
    kind = cfg_optim['type'].lower()
    if kind == 'adam':
        tx = optax.adam(lr_fn, eps=1e-8)
        if wd:
            # torch Adam couples L2 into the gradient
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
        return tx
    if kind == 'ranger':
        return ranger(lr_fn, weight_decay=wd)
    raise ValueError(f'unknown optimizer {cfg_optim["type"]}')
