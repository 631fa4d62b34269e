import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lc_tpu import optim


class TestSchedule:
    def test_warmup_flat_cosine(self):
        s = optim.flat_and_anneal_schedule(
            total_iters=1000, warmup_iters=100, warmup_factor=0.001,
            anneal_point=0.72, anneal_method='cosine')
        assert float(s(0)) == pytest.approx(0.001)
        assert float(s(50)) == pytest.approx(0.001 * 0.5 + 0.5, rel=1e-3)
        assert float(s(100)) == pytest.approx(1.0)
        assert float(s(500)) == pytest.approx(1.0)
        assert float(s(720)) == pytest.approx(1.0, abs=1e-5)
        assert float(s(860)) == pytest.approx(0.5, abs=1e-2)
        assert float(s(999)) < 0.01

    def test_step_anneal(self):
        s = optim.flat_and_anneal_schedule(
            total_iters=900, anneal_method='step', step_gamma=0.1,
            steps=(1 / 3, 2 / 3))
        assert float(s(100)) == pytest.approx(1.0)
        assert float(s(400)) == pytest.approx(0.1)
        assert float(s(700)) == pytest.approx(0.01)

    def test_exp_anneal(self):
        s = optim.flat_and_anneal_schedule(
            total_iters=100, anneal_point=0.5, anneal_method='exp',
            target_lr_factor=0.01)
        assert float(s(100)) == pytest.approx(0.01, rel=1e-3)


class TestRanger:
    def _train(self, tx, steps=60):
        """Minimize ||Wx - y||² for a tiny linear problem."""
        rng = np.random.default_rng(0)
        W_true = rng.normal(size=(4, 4)).astype(np.float32)
        # gradient centralization never moves the row-mean of a 2D param from its
        # init; make the optimum reachable by zero-centering W_true rows
        W_true -= W_true.mean(axis=1, keepdims=True)
        x_in = rng.normal(size=(32, 4)).astype(np.float32)
        y = x_in @ W_true.T
        params = {'w': jnp.zeros((4, 4))}
        state = tx.init(params)

        def loss_fn(p):
            return jnp.mean((x_in @ p['w'].T - y) ** 2)

        losses = []
        for _ in range(steps):
            g = jax.grad(loss_fn)(params)
            upd, state = tx.update(g, state, params)
            params = jax.tree.map(lambda p, u: p + u, params, upd)
            losses.append(float(loss_fn(params)))
        return losses

    def test_converges(self):
        losses = self._train(optim.ranger(0.1), steps=400)
        assert losses[-1] < losses[0] * 0.05

    def test_lookahead_syncs_every_k(self):
        tx = optim.ranger(0.05, k=6, alpha=0.5)
        params = {'w': jnp.ones((3,))}
        state = tx.init(params)
        slows = []
        for i in range(13):
            g = {'w': jnp.ones((3,))}
            upd, state = tx.update(g, state, params)
            params = jax.tree.map(lambda p, u: p + u, params, upd)
            slows.append(np.asarray(state.slow['w']).copy())
        # slow buffer only changes on steps 6 and 12
        assert np.allclose(slows[0], slows[4])
        assert not np.allclose(slows[4], slows[5])
        assert np.allclose(slows[5], slows[10])
        assert not np.allclose(slows[10], slows[11])

    def test_weight_decay_shrinks(self):
        tx = optim.ranger(0.1, weight_decay=0.5)
        params = {'w': jnp.full((3,), 10.0)}
        state = tx.init(params)
        upd, _ = tx.update({'w': jnp.zeros(3)}, state, params)
        assert np.all(np.asarray(upd['w']) < 0)  # pure decay pulls toward zero

    def test_gc_removes_grad_mean(self):
        """For a 2D param, centralization means the update's row-mean (over input
        dims) is ~0 in the early SGD-like phase."""
        tx = optim.ranger(0.1)
        params = {'w': jnp.zeros((4, 8))}
        state = tx.init(params)
        g = {'w': jnp.asarray(np.random.default_rng(1).normal(size=(4, 8)),
                              jnp.float32) + 3.0}
        upd, _ = tx.update(g, state, params)
        row_means = np.asarray(upd['w']).mean(axis=1)
        np.testing.assert_allclose(row_means, 0.0, atol=1e-5)
