import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lc_tpu import codec

RNG = np.random.default_rng(1)


def oracle_encode(value01: int, n: int, black_background: bool):
    """Independent Gray-code oracle: int in [0, 2^n) -> (mod_bits, raw_bits) MSB-first."""
    gray = value01 ^ (value01 >> 1)
    raw = [(value01 >> (n - 1 - i)) & 1 for i in range(n)]
    mod = [(gray >> (n - 1 - i)) & 1 for i in range(n)]
    if black_background:
        mod[0] ^= 1
        if n > 1:
            mod[1] ^= 1
    return mod, raw


class TestCalcBitCount:
    def test_equal_sizes(self):
        assert codec.calc_bit_count([10, 10, 10]) == [7, 7, 7]

    def test_scaled(self):
        # 4x smaller axis loses 2 bits
        assert codec.calc_bit_count([80, 20, 80]) == [7, 5, 7]

    def test_min_clamp(self):
        assert codec.calc_bit_count([1000, 1, 1000]) == [7, 2, 7]


@pytest.mark.parametrize("bb", [False, True])
class TestRoundTrip:
    def test_encode_matches_oracle(self, bb):
        n = 5
        ints = np.arange(2 ** n)
        noc = ints / ((2 ** n - 1) * 0.5) - 1.0
        noc3 = np.stack([noc, noc, noc], axis=-1).astype(np.float32)
        mod, raw = codec.noc_to_bits(jnp.asarray(noc3), (n, n, n), bb)
        for i, v in enumerate(ints):
            m_ref, r_ref = oracle_encode(int(v), n, bb)
            np.testing.assert_array_equal(np.asarray(mod[i, :n], dtype=int), m_ref)
            np.testing.assert_array_equal(np.asarray(raw[i, :n], dtype=int), r_ref)

    def test_exhaustive_roundtrip(self, bb):
        """Every code value decodes back exactly (hard bits -> big logits)."""
        for n in (2, 4, 7):
            ints = np.arange(2 ** n)
            noc = (ints / ((2 ** n - 1) * 0.5) - 1.0).astype(np.float32)
            noc3 = np.stack([noc] * 3, axis=-1)
            mod, _ = codec.noc_to_bits(jnp.asarray(noc3), (n, n, n), bb)
            logits = jnp.where(mod, 20.0, -20.0)
            dec = codec.logits_to_noc(logits, (n, n, n), bb)
            np.testing.assert_allclose(np.asarray(dec), noc3, atol=1e-5)

    def test_mixed_bit_counts(self, bb):
        bit_cnt = (7, 4, 2)
        noc = RNG.uniform(-0.99, 0.99, size=(64, 3)).astype(np.float32)
        mod, _ = codec.noc_to_bits(jnp.asarray(noc), bit_cnt, bb)
        assert mod.shape == (64, sum(bit_cnt))
        logits = jnp.where(mod, 20.0, -20.0)
        dec = np.asarray(codec.logits_to_noc(logits, bit_cnt, bb))
        # decode error bounded by one quantization bin per axis
        for a, n in enumerate(bit_cnt):
            assert np.abs(dec[:, a] - noc[:, a]).max() <= 2.0 / (2 ** n - 1) + 1e-5


@pytest.mark.parametrize("bb", [False, True])
class TestDecodeWithGT:
    def _setup(self, bb, n=5, batch=128):
        ints = RNG.integers(0, 2 ** n, size=(batch,))
        noc = (ints / ((2 ** n - 1) * 0.5) - 1.0).astype(np.float32)
        noc3 = np.stack([noc] * 3, axis=-1)
        mod, raw = codec.noc_to_bits(jnp.asarray(noc3), (n, n, n), bb)
        return noc3, mod, raw

    def test_perfect_prediction_recovers_gt(self, bb):
        n = 5
        noc3, mod, raw = self._setup(bb, n)
        logits = jnp.where(mod, 20.0, -20.0)
        msk = jnp.ones(noc3.shape[0], dtype=bool)
        dec = codec.logits_to_noc_with_gt(logits, raw, (n, n, n), msk, bb)
        np.testing.assert_allclose(np.asarray(dec), noc3, atol=1e-4)

    def test_wrong_msb_uses_gt_above(self, bb):
        """Corrupt one high bit: decoded value = GT bits above the error + sigmoid at it."""
        n = 5
        noc3, mod, raw = self._setup(bb, n, batch=16)
        logits = jnp.where(mod, 20.0, -20.0)
        # flip the Gray logit of bit index 1 on axis 0 => binary bit 1 flips
        corrupted = logits.at[:, 1].multiply(-1.0)
        msk = jnp.ones(noc3.shape[0], dtype=bool)
        dec = np.asarray(codec.logits_to_noc_with_gt(
            corrupted, raw, (n, n, n), msk, bb))[:, 0]
        raw_np = np.asarray(raw)[:, :n]
        w = 2.0 ** (n - 1 - np.arange(n))
        # bits 0 and >=2 from GT, bit 1 saturated wrong => sigmoid ~ (0 or 1) opposite of GT
        expect_val = (raw_np * w).sum(-1) - raw_np[:, 1] * w[1] \
            + (1.0 - raw_np[:, 1]) * w[1]
        expect = expect_val / ((2 ** n - 1) * 0.5) - 1.0
        np.testing.assert_allclose(dec, expect, atol=1e-3)

    def test_gradient_flows_only_through_msb_error_bit(self, bb):
        n = 4
        noc3, mod, raw = self._setup(bb, n, batch=4)
        base_logits = np.asarray(jnp.where(mod, 3.0, -3.0))
        msk = jnp.ones(4, dtype=bool)

        def f(lg):
            return jnp.sum(codec.logits_to_noc_with_gt(lg, raw, (n, n, n), msk, bb))

        g = np.asarray(jax.grad(f)(jnp.asarray(base_logits)))
        # exactly one nonzero gradient entry per axis (the soft LSB when prediction is perfect)
        nz = (np.abs(g) > 0).sum(axis=-1)
        np.testing.assert_array_equal(nz, np.full(4, 3))

    def test_outside_mask_no_gradient(self, bb):
        n = 4
        noc3, mod, raw = self._setup(bb, n, batch=4)
        logits = jnp.where(mod, 3.0, -3.0)
        msk = jnp.zeros(4, dtype=bool)

        def f(lg):
            return jnp.sum(codec.logits_to_noc_with_gt(lg, raw, (n, n, n), msk, bb))

        g = np.asarray(jax.grad(f)(logits))
        np.testing.assert_array_equal(g, np.zeros_like(g))
