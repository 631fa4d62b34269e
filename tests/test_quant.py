"""Tests for post-training int8 inference (lc_tpu/models/quant.py).

Three layers of pinning:
  1. plumbing exactness — with weights/activations constructed exactly
     representable on the int8 grid, the quantized conv/deconv must equal the
     f32 computation bit-for-bit (catches layout, scale-broadcast, padding and
     dilation bugs);
  2. model-level tolerance — on CDPN and Zebra with REALISTIC weight scales
     (He-init; the default conv_init std=0.001 collapses activations to ~1e-9
     by the deep layers and makes relative comparisons meaningless), the int8
     forward must track the f32 forward within a small multiple of the bf16
     forward's own error (int8 is a drop-in for the bf16 path, so bf16's
     deviation from f32 is the honest yardstick);
  3. wiring — the skip predicate and the harness jit-cache keying.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from lc_tpu.models import build_model
from lc_tpu.models import layers as L
from lc_tpu.models import quant as Q


def _he_reinit(variables, seed=0):
    """Replace every conv/dense kernel with He-normal values (realistic trained
    scale) and biases/BN params with small random values, keeping the tree."""
    rng = np.random.default_rng(seed)

    def re(path, leaf):
        name = path[-1].key if hasattr(path[-1], 'key') else str(path[-1])
        a = np.asarray(leaf, np.float32)
        if name == 'kernel' and a.ndim == 4:        # conv (kh, kw, cin, cout)
            fan_in = a.shape[0] * a.shape[1] * a.shape[2]
            return jnp.asarray(rng.normal(0, np.sqrt(2 / fan_in), a.shape),
                               jnp.float32)
        if name == 'kernel':                         # dense
            return jnp.asarray(
                rng.normal(0, np.sqrt(1 / a.shape[0]), a.shape), jnp.float32)
        if name in ('bias', 'mean'):
            return jnp.asarray(rng.normal(0, 0.05, a.shape), jnp.float32)
        if name in ('scale', 'var'):
            return jnp.asarray(rng.uniform(0.7, 1.3, a.shape), jnp.float32)
        return leaf

    return jax.tree_util.tree_map_with_path(re, variables)


def _rel_rms(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.sqrt(np.mean((a - b) ** 2))
                 / (np.sqrt(np.mean(a ** 2)) + 1e-30))


class TestQuantizeTensor:
    def test_roundtrip_exact_on_grid(self):
        """Integer tensors with max 127 quantize with scale 1 -> exact."""
        rng = np.random.default_rng(0)
        x = rng.integers(-127, 128, (4, 5)).astype(np.float32)
        x.flat[0] = 127.0
        q, s = Q.quantize_tensor(jnp.asarray(x))
        assert q.dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(q, np.float32) * np.asarray(s), x)

    def test_per_channel_scales(self):
        rng = np.random.default_rng(1)
        w = rng.normal(0, 1, (3, 3, 4, 8)).astype(np.float32)
        q, s = Q.quantize_tensor(jnp.asarray(w), axes=(0, 1, 2))
        assert s.shape == (8,)
        deq = np.asarray(q, np.float32) * np.asarray(s)
        # error bounded by half a quantization step per channel
        step = np.asarray(s)
        assert np.all(np.abs(deq - w) <= 0.5 * step[None, None, None, :] + 1e-7)

    def test_zero_channel_no_nan(self):
        w = np.zeros((3, 3, 2, 2), np.float32)
        q, s = Q.quantize_tensor(jnp.asarray(w), axes=(0, 1, 2))
        assert np.all(np.isfinite(np.asarray(s)))
        assert np.all(np.asarray(q) == 0)


def _int_weights(rng, shape):
    """Weights exactly representable on the int8 grid: integers with a pinned
    |w|=127 per-output-channel max, so quantize_tensor's scale is exactly 1."""
    w = rng.integers(-127, 128, shape).astype(np.float32)
    w[0, 0, 0, :] = 127.0           # pin per-channel max -> scale exactly 1.0
    return w


class TestPlumbingExactness:
    def test_conv_exact_on_int_grid(self):
        """Integer weights & activations with max 127 -> scale 1 -> the int8
        conv must reproduce the f32 conv exactly (int32 accumulation is exact
        for these magnitudes)."""
        rng = np.random.default_rng(2)
        x = rng.integers(-127, 128, (1, 9, 9, 4)).astype(np.float32)
        x[0, 0, 0, 0] = 127.0
        for stride, pad, dil in [(1, 1, 1), (2, 1, 1), (1, 2, 2), (1, 0, 1)]:
            m = nn.Conv(6, (3, 3), strides=(stride, stride),
                        padding=((pad, pad), (pad, pad)),
                        kernel_dilation=(dil, dil), dtype=jnp.float32)
            v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
            v = jax.tree.map(lambda a: a, v)
            v['params']['kernel'] = jnp.asarray(
                _int_weights(rng, v['params']['kernel'].shape))
            v['params']['bias'] = jnp.asarray(
                rng.normal(0, 1, v['params']['bias'].shape).astype(np.float32))
            ref = m.apply(v, jnp.asarray(x))
            with Q.quantized_int8():
                got = m.apply(v, jnp.asarray(x))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref)), \
                (stride, pad, dil)

    def test_deconv_exact_on_int_grid(self):
        rng = np.random.default_rng(3)
        x = rng.integers(-127, 128, (1, 8, 8, 4)).astype(np.float32)
        x[0, 0, 0, 0] = 127.0
        L.set_compute_dtype(jnp.float32)
        try:
            m = L.Deconv2x(6)
            v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
            v = jax.tree.map(lambda a: a, v)
            v['params']['kernel'] = jnp.asarray(
                _int_weights(rng, v['params']['kernel'].shape))
            ref = m.apply(v, jnp.asarray(x))
            with Q.quantized_int8():
                got = m.apply(v, jnp.asarray(x))
            np.testing.assert_array_equal(np.asarray(got, np.float32),
                                          np.asarray(ref, np.float32))
        finally:
            L.set_compute_dtype(jnp.bfloat16)

    def test_grouped_conv_left_alone(self):
        """feature_group_count > 1 is not quantized (guard in the interceptor);
        output must equal the unintercepted forward exactly."""
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32))
        m = nn.Conv(4, (3, 3), padding=1, feature_group_count=4,
                    dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(v, x)
        with Q.quantized_int8():
            got = m.apply(v, x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_input_dilated_and_masked_conv_left_alone(self):
        """_int8_conv ignores nn.Conv's input_dilation and mask, so the
        interceptor must fall through for convs that set either — quantizing
        them would be silently wrong geometry. Output must equal the
        unintercepted forward exactly."""
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32))
        for kw in (dict(input_dilation=(2, 2)),
                   dict(mask=jnp.asarray(
                       rng.integers(0, 2, (3, 3, 4, 6)).astype(np.float32)))):
            m = nn.Conv(6, (3, 3), padding=1, dtype=jnp.float32, **kw)
            v = m.init(jax.random.PRNGKey(0), x)
            ref = m.apply(v, x)
            with Q.quantized_int8():
                got = m.apply(v, x)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref)), kw

    def test_per_sample_activation_scale_batch_independence(self):
        """Activation scales are per-sample (reduce H,W,C, keep batch), so a
        sample's quantized conv output must be IDENTICAL whether it is alone
        in the batch or next to a much larger-magnitude batchmate (a
        per-tensor scale would re-grid the small sample by the big one's max).
        int8 accumulation is exact, dequant is per-sample deterministic —
        bit-equality, independent of the conv's compiled batch size."""
        rng = np.random.default_rng(9)
        small = rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32)
        big = 1000.0 * rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32)
        m = nn.Conv(6, (3, 3), padding=1, dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(small))
        with Q.quantized_int8():
            alone = m.apply(v, jnp.asarray(small))
            paired = m.apply(v, jnp.asarray(np.concatenate((small, big), 0)))
        np.testing.assert_array_equal(np.asarray(alone[0]),
                                      np.asarray(paired[0]))

    def test_per_sample_activation_scale_batch_independence_deconv(self):
        L.set_compute_dtype(jnp.float32)
        try:
            rng = np.random.default_rng(10)
            small = rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32)
            big = 1000.0 * rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32)
            m = L.Deconv2x(6)
            v = m.init(jax.random.PRNGKey(0), jnp.asarray(small))
            with Q.quantized_int8():
                alone = m.apply(v, jnp.asarray(small))
                paired = m.apply(v, jnp.asarray(np.concatenate((small, big),
                                                               0)))
            np.testing.assert_array_equal(np.asarray(alone[0]),
                                          np.asarray(paired[0]))
        finally:
            L.set_compute_dtype(jnp.bfloat16)


def _model_outputs(model, variables, x):
    out = model.apply(variables, x, train=False)
    return {k: np.asarray(v, np.float32) for k, v in out.items()}


class TestModelTolerance:
    @pytest.mark.parametrize('family', [
        'cdpn',
        pytest.param('zebra', marks=pytest.mark.slow),  # 60s extra compile
    ])
    def test_forward_tracks_f32_within_bf16_yardstick(self, family):
        """int8 forward error (vs the f32 forward) must be within a small
        multiple of the bf16 forward's own error — int8 replaces the bf16
        path, so bf16's deviation is the honest baseline."""
        if family == 'cdpn':
            model = build_model('cdpn_resnet', {'concat': False})
        else:
            model = build_model('zebra_DeepLabV3', {'concat': True},
                                total_bit_cnt=18)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32))
        variables = _he_reinit(model.init(jax.random.PRNGKey(0), x,
                                          train=False))
        # f32 ground truth
        L.set_compute_dtype(jnp.float32)
        try:
            out_f32 = _model_outputs(model, variables, x)
        finally:
            L.set_compute_dtype(jnp.bfloat16)
        out_bf16 = _model_outputs(model, variables, x)
        with Q.quantized_int8():
            out_int8 = _model_outputs(model, variables, x)
        for k in out_f32:
            f, b, q = out_f32[k], out_bf16[k], out_int8[k]
            if k == 'xyz_weights_scale':
                # exp head over the mean-pooled deepest feature: the most
                # error-accumulating scalar in the net, and the one output
                # whose error does NOT move the pose (a global weight rescale
                # cancels in quantile selection and in the weighted LM normal
                # equations). Bound it absolutely in log domain: a broken
                # dequant is off by orders of magnitude; even the bf16 path
                # moves this head a lot on random He-init weights, so the
                # yardstick is bf16's own log error with generous headroom.
                eq = float(np.sqrt(np.mean((np.log(f) - np.log(q)) ** 2)))
                eb = float(np.sqrt(np.mean((np.log(f) - np.log(b)) ** 2)))
                assert np.all(np.isfinite(q)) and np.all(q > 0), k
                assert eq < 10 * eb + 0.1, (k, eq, eb)
                continue
            e_bf16 = _rel_rms(f, b)
            e_int8 = _rel_rms(f, q)
            assert np.all(np.isfinite(q)), k
            # int8 with dynamic per-tensor activation scales lands in the same
            # error decade as bf16; 6x headroom keeps this non-flaky while
            # still catching a broken dequant (which is orders of magnitude)
            assert e_int8 < 6 * e_bf16 + 5e-3, (k, e_int8, e_bf16)

    def test_skip_predicate_pins_layers(self):
        """skip=always-True must reproduce the default (bf16) forward exactly."""
        model = build_model('cdpn_resnet', {'concat': False})
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32))
        variables = _he_reinit(model.init(jax.random.PRNGKey(0), x,
                                          train=False))
        ref = _model_outputs(model, variables, x)
        with Q.quantized_int8(skip=lambda m: True):
            got = _model_outputs(model, variables, x)
        for k in ref:
            np.testing.assert_array_equal(got[k], ref[k])


class TestEndToEndPose:
    @pytest.mark.slow  # 80s full chain x2; ModelTolerance[cdpn] stays quick-lane
    def test_solver_chain_pose_agreement(self):
        """Full inference chain (CNN -> decode -> select -> RANSAC -> weighted
        LM) with the CNN under int8 must solve to (nearly) the same pose as
        the f32 chain. The dense field is pose-consistent with a small CNN
        contribution (the bench.py headline construction), so the pose is
        well-determined and the check isolates what int8 changes."""
        from lc_tpu import geom, inference
        model = build_model('cdpn_resnet', {'concat': False})
        rng = np.random.default_rng(8)
        B, h = 2, 16
        x = jnp.asarray(rng.normal(0, 1, (B, 64, 64, 3)).astype(np.float32))
        variables = _he_reinit(model.init(jax.random.PRNGKey(0), x,
                                          train=False))
        from scipy.spatial.transform import Rotation as sciR
        K = np.broadcast_to(np.array([[500.0, 0, h / 2], [0, 500.0, h / 2],
                                      [0, 0, 1]], np.float32), (B, 3, 3))
        Rs = sciR.random(B, random_state=8).as_matrix().astype(np.float32)
        ts = np.concatenate((rng.uniform(-5, 5, (B, 2)),
                             rng.uniform(400, 600, (B, 1))), -1).astype(np.float32)
        uv = np.asarray(geom.gen_uv((h, h))).reshape(-1, 2)
        z = rng.uniform(400, 600, (B, h * h, 1)).astype(np.float32)
        homo = np.concatenate((np.broadcast_to(uv, (B, h * h, 2)) * z, z), -1)
        xyz = np.asarray(geom.xyz_from_homo_z(
            jnp.asarray(homo), jnp.asarray(Rs), jnp.asarray(ts),
            jnp.asarray(K)))
        noc_field = jnp.asarray((xyz / 100.0).reshape(B, h, h, 3))
        gt = {'out_K': jnp.asarray(K.copy()),
              'noc_scale': jnp.full((B, 3), 100.0)}

        def solve(int8):
            if int8:
                with Q.quantized_int8():
                    out = model.apply(variables, x, train=False)
            else:
                out = model.apply(variables, x, train=False)
            out = dict(out)
            # normalize the CNN contribution to ~1% NOC (≈1 mm at scale 100):
            # He-init outputs are O(10-100), which would swamp the field and
            # push the solve into a regime where no pose is recoverable
            cnn = out['xyz_noc']
            cnn = cnn / (jnp.sqrt(jnp.mean(cnn ** 2)) + 1e-9) * 0.01
            out['xyz_noc'] = noc_field + cnn
            states = inference.solve_pnp_dense(
                out, gt, jax.random.PRNGKey(3), sample=1,
                point_select='quantile', quantile=0.3, solvers=('weighted',))
            return np.asarray(states['weighted'])

        p_f, p_q = solve(False), solve(True)
        # same pose up to the mm/level perturbation int8 adds to the field
        np.testing.assert_allclose(p_q[:, 4:], p_f[:, 4:], atol=3.0)
        dot = np.abs(np.sum(p_q[:, :4] * p_f[:, :4], axis=-1))
        assert np.all(dot > 0.999)


class TestHarnessWiring:
    def test_jitted_apply_cache_keys_on_int8(self):
        """_jitted_apply must compile distinct programs for int8 on/off (the
        interception is a trace-time effect) and their outputs must differ on
        a realistic model but agree within tolerance."""
        from lc_tpu.harness import _jitted_apply
        model = build_model('cdpn_resnet', {'concat': False})
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32))
        variables = _he_reinit(model.init(jax.random.PRNGKey(0), x,
                                          train=False))
        f_plain = _jitted_apply(model, False)
        f_int8 = _jitted_apply(model, True)
        assert f_plain is not f_int8
        assert _jitted_apply(model, False) is f_plain    # cache hit
        assert _jitted_apply(model, True) is f_int8
        a = f_plain(variables, x)
        b = f_int8(variables, x)
        da = np.asarray(a['xyz_noc'], np.float32)
        db = np.asarray(b['xyz_noc'], np.float32)
        assert not np.array_equal(da, db)                # int8 actually on
        assert _rel_rms(da, db) < 0.2


class TestStaticScales:
    """Calibrated static activation scales (quant.calibrate_act_scales +
    quantized_int8(act_scales=...)): the bandwidth-lean quantization mode —
    the quantize is elementwise (no per-conv amax reduction barrier), see the
    module docstring and BASELINE.md's int8 roofline section."""

    def _setup(self, seed=9, batch=1):
        model = build_model('cdpn_resnet', {'concat': False})
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(0, 1, (batch, 64, 64, 3)).astype(np.float32))
        variables = _he_reinit(model.init(jax.random.PRNGKey(0), x,
                                          train=False))
        return model, variables, x

    def test_single_conv_static_equals_dynamic_bitwise(self):
        """At batch 1 with calibration on the exact sample, the static scale
        IS the dynamic per-sample scale, and a lone conv's quantized path is
        exact arithmetic end to end (f32 max is order-independent, round/clip
        exact, s8xs8->s32 integer, dequant f32 multiply deterministic) — so
        static and dynamic must agree bit-for-bit. Pins the scale-keying
        plumbing: a wrong-scale lookup cannot survive this. (A full-MODEL
        bitwise check does not hold: the unquantized bf16 stem compiles into
        different XLA programs for the two modes, and bf16 conv rounding is
        program-dependent — model-level agreement is pinned by the tolerance
        and NaN-poisoning tests instead.)"""
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(0, 2, (1, 16, 16, 8)), jnp.float32)

        class OneConv(nn.Module):
            @nn.compact
            def __call__(self, z):
                z = nn.Conv(16, (3, 3), padding=1, name='c')(z)
                return L.Deconv2x(8, name='d')(z.astype(jnp.float32))

        m = OneConv()
        v = m.init(jax.random.PRNGKey(2), x)
        v = _he_reinit(v, seed=12)
        scales = Q.calibrate_act_scales(lambda b: m.apply(v, b), [x])
        assert len(scales) == 2          # the conv and the deconv
        with Q.quantized_int8():
            out_dyn = np.asarray(m.apply(v, x), np.float32)
        with Q.quantized_int8(act_scales=scales):
            out_st = np.asarray(m.apply(v, x), np.float32)
        assert out_dyn.std() > 0         # non-degenerate
        np.testing.assert_array_equal(out_st, out_dyn)

    def test_static_forward_tracks_f32_within_bf16_yardstick(self):
        """Static scales calibrated on separate batches: the quantized forward
        on a NEW batch must stay in the same error decade as bf16 (same
        yardstick as the dynamic-mode test)."""
        model, variables, _ = self._setup()
        rng = np.random.default_rng(10)
        calib = [jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
                 for _ in range(2)]
        x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
        scales = Q.calibrate_act_scales(
            lambda b: model.apply(variables, b, train=False), calib)
        L.set_compute_dtype(jnp.float32)
        try:
            out_f32 = _model_outputs(model, variables, x)
        finally:
            L.set_compute_dtype(jnp.bfloat16)
        out_bf16 = _model_outputs(model, variables, x)
        with Q.quantized_int8(act_scales=scales):
            out_st = _model_outputs(model, variables, x)
        for k in out_f32:
            if k == 'xyz_weights_scale':
                assert np.all(np.isfinite(out_st[k])) and np.all(out_st[k] > 0)
                continue
            e_bf16 = _rel_rms(out_f32[k], out_bf16[k])
            e_st = _rel_rms(out_f32[k], out_st[k])
            assert np.all(np.isfinite(out_st[k])), k
            # static per-tensor scales give up per-sample range adaptation;
            # allow a wider (but same-decade) band than dynamic mode
            assert e_st < 12 * e_bf16 + 1e-2, (k, e_st, e_bf16)

    def test_empty_dict_falls_back_to_dynamic(self):
        """Paths missing from act_scales quantize dynamically — {} must
        reproduce the dynamic mode exactly."""
        model, variables, x = self._setup(batch=2)
        with Q.quantized_int8():
            out_dyn = _model_outputs(model, variables, x)
        with Q.quantized_int8(act_scales={}):
            out_fb = _model_outputs(model, variables, x)
        for k in out_dyn:
            np.testing.assert_array_equal(out_fb[k], out_dyn[k])

    def test_calibration_keys_match_interceptor_lookup(self):
        """Every calibrated path must be consumed by the quantizing
        interceptor: quantize with a scales dict where each value is poisoned
        to NaN — if lookups hit, outputs go NaN; a silent key mismatch would
        keep them finite."""
        model, variables, x = self._setup(batch=1)
        scales = Q.calibrate_act_scales(
            lambda b: model.apply(variables, b, train=False), [x])
        poisoned = {k: jnp.float32(np.nan) for k in scales}
        with Q.quantized_int8(act_scales=poisoned):
            out = model.apply(variables, x, train=False)
        assert not np.all(np.isfinite(np.asarray(out['xyz_noc'], np.float32)))
