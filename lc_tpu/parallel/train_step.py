"""The jit-compiled, mesh-sharded training step.

One XLA program per step: model forward (bf16 matmuls via the default TPU matmul
precision), on-the-fly target synthesis, all losses including the LC covariance
machinery, backward, Ranger update, EMA/clipper state updates. Batch inputs are
sharded over the 'data' mesh axis; parameters/optimizer state are replicated and
gradients all-reduce over ICI automatically under the SPMD partitioner.

The reference's equivalent is the hot loop at train.py:52-72 plus the backward hooks
— here it is one donated-argument compiled function.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..loss import (LossConfig, LossState, compute_losses, finalize_loss_state,
                    init_loss_state, zero_taps)
from ..loss.targets import annots_on_the_fly


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    loss_state: LossState
    step: jax.Array


def create_train_state(model, tx, rng, sample_input, loss_cfg: LossConfig
                       ) -> TrainState:
    variables = model.init(rng, sample_input, train=False)
    params = variables['params']
    state = TrainState(
        params=params,
        batch_stats=variables.get('batch_stats', {}),
        opt_state=tx.init(params),
        loss_state=init_loss_state(loss_cfg),
        step=jnp.zeros((), jnp.int32),
    )
    # Donated-argument safety: jax caches small constants, so sibling leaves
    # (e.g. the three clipper states' -1.0 init) can alias the same buffer —
    # donating aliased buffers raises "donate the same buffer twice". Copy every
    # leaf into its own buffer once.
    return jax.tree.map(lambda x: jnp.asarray(x).copy() if hasattr(x, 'copy')
                        else x, state)


def make_train_step(model, tx, loss_cfg: LossConfig, *,
                    sym_aware_start: int = 0, donate: bool = True):
    """Returns train_step(state, gt_batch, key) -> (state, metrics)."""

    def loss_fn(params, taps, batch_stats, loss_state, gt, step, top_left):
        out, mutated = model.apply(
            {'params': params, 'batch_stats': batch_stats},
            gt['img_in'], train=True, mutable=['batch_stats'])
        ann = annots_on_the_fly(
            gt, out, step=step, sym_aware_start=sym_aware_start,
            bit_cnt=loss_cfg.bit_cnt,
            black_background=loss_cfg.black_background)
        gt = dict(gt)
        gt.update(ann)
        total, loss_dict, new_loss_state = compute_losses(
            loss_cfg, gt, out, loss_state, step, taps,
            sample_top_left=top_left)
        return total, (loss_dict, new_loss_state, mutated['batch_stats'])

    def train_step(state: TrainState, gt: dict, key: jax.Array):
        k_tl, _ = jax.random.split(key)
        top_left = jax.random.randint(k_tl, (2,), 0, loss_cfg.dense_sample)
        grad_fn = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)
        (grads, tap_grads), (loss_dict, new_loss_state, new_bs) = grad_fn(
            state.params, zero_taps(), state.batch_stats, state.loss_state,
            gt, state.step, (top_left[0], top_left[1]))

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_loss_state = finalize_loss_state(new_loss_state, tap_grads, loss_cfg)

        metrics = dict(loss_dict)
        metrics['grad_norm'] = optax.global_norm(grads)
        new_state = TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt, loss_state=new_loss_state,
                               step=state.step + 1)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)
