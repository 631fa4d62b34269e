"""Optimizer / LR-schedule / grad-clipper parity vs the in-image reference.

The reference Ranger (lib/optim/ranger.py) and flat_and_anneal scheduler
(lib/optim/lr_scheduler.py:179) are pure torch; we run them step-for-step
against lc_tpu's optax Ranger and schedule function on identical problems.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from _refshim import load_reference

ref = load_reference()

from lc_tpu.optim.ranger import ranger
from lc_tpu.optim.schedule import flat_and_anneal_schedule
from lc_tpu.loss.clip import (
    init_clipper_state, clip_threshold, update_clipper_state)


@pytest.fixture(scope="module", autouse=True)
def _x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)


SCHED_CASES = [
    dict(anneal_method="cosine", warmup_iters=10, warmup_factor=0.1,
         anneal_point=0.72, target_lr_factor=0.0),
    dict(anneal_method="linear", warmup_iters=0, anneal_point=0.5,
         target_lr_factor=0.05),
    dict(anneal_method="poly", warmup_iters=5, warmup_method="constant",
         warmup_factor=0.3, anneal_point=0.6, poly_power=2.0),
    dict(anneal_method="exp", warmup_iters=3, anneal_point=0.4,
         target_lr_factor=0.01),
    dict(anneal_method="step", warmup_iters=8, steps=(2 / 3.0, 8 / 9.0),
         step_gamma=0.1),
]


@pytest.mark.parametrize("case", SCHED_CASES,
                         ids=[c["anneal_method"] for c in SCHED_CASES])
def test_flat_and_anneal_schedule(case):
    total = 100
    base_lr = 2e-4
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched_t = ref.lr_scheduler.flat_and_anneal_lr_scheduler(
        opt, total_iters=total, **{k: (list(v) if isinstance(v, tuple) else v)
                                   for k, v in case.items()})
    sched_j = flat_and_anneal_schedule(total_iters=total, base_lr=base_lr,
                                       **case)
    ref_curve, mine = [], []
    for i in range(total):
        ref_curve.append(opt.param_groups[0]["lr"])
        mine.append(float(sched_j(i)))
        opt.step()
        sched_t.step()
    # lc_tpu's schedule evaluates in f32 on device; compare at f32 resolution
    np.testing.assert_allclose(mine, ref_curve, rtol=1e-5, atol=1e-12)


@pytest.mark.parametrize("weight_decay", [0.0, 1e-2])
def test_ranger_trajectory(weight_decay):
    """25 steps on a fixed quadratic: parameters must track the reference
    through RAdam warmup (N_sma <= 5 fallback), rectified steps, GC, and two
    lookahead syncs (k=6)."""
    rng = np.random.default_rng(5)
    # conv-like (4D) + fc-like (2D) + bias-like (1D) params: exercises the GC
    # dim threshold (reference ranger.py:144)
    shapes = [(3, 2, 3, 3), (5, 4), (5,)]
    params0 = [rng.normal(size=s) for s in shapes]
    targets = [rng.normal(size=s) for s in shapes]
    lr = 1e-2

    # reference
    tparams = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in params0]
    opt = ref.ranger.Ranger(tparams, lr=lr, weight_decay=weight_decay)
    for _ in range(25):
        opt.zero_grad()
        loss = sum(((p - torch.from_numpy(t)) ** 2).sum()
                   for p, t in zip(tparams, targets))
        loss.backward()
        opt.step()

    # lc_tpu
    jparams = {f"p{i}": jnp.asarray(p) for i, p in enumerate(params0)}
    jtargets = {f"p{i}": jnp.asarray(t) for i, t in enumerate(targets)}
    tx = ranger(lr, weight_decay=weight_decay)
    state = tx.init(jparams)

    def loss_fn(ps):
        return sum(jnp.sum((p - jtargets[k]) ** 2) for k, p in ps.items())

    for _ in range(25):
        grads = jax.grad(loss_fn)(jparams)
        updates, state = tx.update(grads, state, jparams)
        jparams = jax.tree.map(lambda p, u: p + u, jparams, updates)

    # the reference runs its internal math in float32 regardless of param dtype
    # (ranger.py:114,119: grad.float()/p.data.float()); its own rounding bounds
    # the achievable agreement at ~1e-6 absolute over 25 steps
    for i, tp in enumerate(tparams):
        np.testing.assert_allclose(
            np.asarray(jparams[f"p{i}"]), tp.detach().numpy(),
            rtol=1e-4, atol=1e-6, err_msg=f"param {i} diverged")


def test_ranger_gc_conv_only():
    rng = np.random.default_rng(6)
    shapes = [(2, 3, 3, 3), (4, 3)]
    params0 = [rng.normal(size=s) for s in shapes]
    grads_seq = [[rng.normal(size=s) for s in shapes] for _ in range(8)]

    tparams = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in params0]
    opt = ref.ranger.Ranger(tparams, lr=1e-2, use_gc=True, gc_conv_only=True)
    for grads in grads_seq:
        for p, g in zip(tparams, grads):
            p.grad = torch.from_numpy(g.copy())
        opt.step()

    jparams = {f"p{i}": jnp.asarray(p) for i, p in enumerate(params0)}
    tx = ranger(1e-2, gc_conv_only=True)
    state = tx.init(jparams)
    for grads in grads_seq:
        g = {f"p{i}": jnp.asarray(x) for i, x in enumerate(grads)}
        updates, state = tx.update(g, state, jparams)
        jparams = jax.tree.map(lambda p, u: p + u, jparams, updates)

    for i, tp in enumerate(tparams):  # f32 reference internals: see above
        np.testing.assert_allclose(np.asarray(jparams[f"p{i}"]),
                                   tp.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_norm_clipper_ema_and_clipping():
    """NormClipper parity: threshold evolution + clipped grads over a sequence
    (reference lib/utils/grad.py:5-31)."""
    rng = np.random.default_rng(9)
    clipper = ref.grad.NormClipper(initial_max_norm=100, rel_thresh=0.7,
                                   momentum=0.1)
    state = init_clipper_state(jnp.float64)
    for step in range(12):
        g = rng.normal(size=(64,)) * (200.0 if step in (0, 5) else 3.0)
        thr = float(clip_threshold(state, 100.0))
        norm = float(np.linalg.norm(g))
        coef = min(thr / (norm + 1e-6), 1.0)
        mine_clipped = g * coef
        state = update_clipper_state(state, jnp.asarray(norm), rel_thresh=0.7,
                                     momentum=0.1, initial_max_norm=100.0)
        theirs = clipper.clip(torch.from_numpy(g.copy())).numpy()
        np.testing.assert_allclose(mine_clipped, theirs, rtol=1e-9, atol=1e-12,
                                   err_msg=f"step {step}")
        np.testing.assert_allclose(float(state.max_norm),
                                   float(clipper.max_norm), rtol=1e-6,
                                   err_msg=f"threshold at step {step}")
