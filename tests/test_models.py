import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lc_tpu import models
from lc_tpu.models import layers as mlayers


class TestLayers:
    def test_bilinear_align_corners_matches_torch(self):
        import torch
        x = np.random.default_rng(0).normal(size=(1, 4, 6, 3)).astype(np.float32)
        up = np.asarray(models.upsample_bilinear_align_corners(jnp.asarray(x)))
        t = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2,
            mode='bilinear', align_corners=True).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(up, t, atol=1e-5)

    def test_conv_layout_matches_torch(self):
        import torch
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
        w = rng.normal(size=(5, 4, 3, 3)).astype(np.float32)  # torch OIHW
        tout = torch.nn.functional.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
            padding=1).numpy().transpose(0, 2, 3, 1)
        conv = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        np.testing.assert_allclose(np.asarray(conv), tout, atol=1e-4)

    def test_convtranspose_layout_matches_torch(self):
        """Deconv2x must reproduce torch ConvTranspose2d(k3, s2, p1, op1) exactly
        when fed the same weights through the porting transpose."""
        import torch
        from lc_tpu.models import layers as L
        L.set_compute_dtype(jnp.float32)
        try:
            rng = np.random.default_rng(2)
            x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
            w = rng.normal(size=(4, 6, 3, 3)).astype(np.float32)  # (I, O, kH, kW)
            tout = torch.nn.functional.conv_transpose2d(
                torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
                stride=2, padding=1, output_padding=1).numpy().transpose(0, 2, 3, 1)
            mod = L.Deconv2x(6)
            from lc_tpu.models.torch_port import _convT_w
            out = mod.apply({'params': {'kernel': jnp.asarray(_convT_w(w))}},
                            jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(out), tout, atol=1e-4)
        finally:
            L.set_compute_dtype(jnp.bfloat16)

    def test_stem_s2d_matches_strided(self):
        """The space-to-depth stem conv must be arithmetically identical to the
        plain 7x7/s2 form (same parameter tree, f32 reassociation only), and
        fall back to the strided conv on odd input sizes."""
        from lc_tpu.models import layers as L
        from lc_tpu.models.resnet import ResNetStem
        L.set_compute_dtype(jnp.float32)
        try:
            rng = np.random.default_rng(7)
            x = jnp.asarray(rng.normal(0, 1, (2, 64, 96, 3)).astype(np.float32))
            ref = ResNetStem(s2d=False)
            v = ref.init(jax.random.PRNGKey(0), x, train=False)
            v = jax.tree.map(lambda a: a, v)
            v['params']['conv1']['kernel'] = jnp.asarray(
                rng.normal(0, 0.1, (7, 7, 3, 64)).astype(np.float32))
            s2d = ResNetStem(s2d=True)
            assert (jax.tree_util.tree_structure(
                        s2d.init(jax.random.PRNGKey(0), x, train=False))
                    == jax.tree_util.tree_structure(v))
            y_ref = np.asarray(ref.apply(v, x, train=False))
            y_s2d = np.asarray(s2d.apply(v, x, train=False))
            np.testing.assert_allclose(y_s2d, y_ref, atol=1e-4)
            x_odd = x[:, :63, :95]
            np.testing.assert_allclose(
                np.asarray(s2d.apply(v, x_odd, train=False)),
                np.asarray(ref.apply(v, x_odd, train=False)), atol=1e-4)
        finally:
            L.set_compute_dtype(jnp.bfloat16)

    def test_maxpool_matches_torch(self):
        import torch
        x = np.random.default_rng(3).normal(size=(1, 9, 9, 2)).astype(np.float32)
        ours = np.asarray(mlayers.max_pool_3x3_s2(jnp.asarray(x)))
        t = torch.nn.functional.max_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, stride=2,
            padding=1).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, t, atol=1e-6)


class TestCDPN:
    def test_shapes_dense(self):
        model = models.build_model('cdpn_resnet', {'concat': False})
        x = jnp.zeros((2, 64, 64, 3))  # small input for test speed: 64 -> 16 out
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out['xyz_noc'].shape == (2, 16, 16, 3)
        assert out['xyz_weight_logits'].shape == (2, 16, 16, 2)
        assert out['msk_vis_logits'].shape == (2, 16, 16, 1)
        assert out['xyz_weights_scale'].shape == (2, 1, 1, 1)
        assert np.all(np.asarray(out['xyz_weights_scale']) > 0)

    def test_train_mode_updates_batch_stats(self):
        model = models.build_model('cdpn_resnet', {'concat': False})
        x = jnp.ones((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        _, mutated = model.apply(variables, x, train=True,
                                 mutable=['batch_stats'])
        before = jax.tree.leaves(variables['batch_stats'])
        after = jax.tree.leaves(mutated['batch_stats'])
        changed = any(not np.allclose(b, a) for b, a in zip(before, after))
        assert changed

    def test_binary_head_channels(self):
        model = models.build_model('cdpn_resnet', {'concat': False},
                                   total_bit_cnt=18)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out['xyz_noc_bin'].shape == (1, 16, 16, 18)


class TestZebra:
    def test_shapes(self):
        model = models.build_model('zebra_DeepLabV3',
                                   {'concat': True, 'output_kernel_size': 1},
                                   total_bit_cnt=19)
        x = jnp.zeros((1, 64, 64, 3))  # 64 -> OS8 8² high -> out 32²
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out['xyz_noc_bin'].shape == (1, 32, 32, 19)
        assert out['xyz_weight_logits'].shape == (1, 32, 32, 2)


class TestSparse:
    def test_softargmax(self):
        # delta at (x=5, y=2) -> mean (5, 2), tiny std
        prob = np.zeros((1, 1, 8, 8), np.float32)
        prob[0, 0, 2, 5] = 1.0
        mean, std = models.ptnet.softargmax_2d_std(jnp.asarray(prob))
        np.testing.assert_allclose(np.asarray(mean)[0, 0], [5.0, 2.0], atol=1e-5)
        assert np.all(np.asarray(std) < 0.01)

    def test_sparse_head(self):
        model = models.build_model('cdpn_resnet', {'concat': False}, sparse_cnt=16)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out['pts2d'].shape == (1, 16, 2)
        assert out['pts2d_std'].shape == (1, 16, 2)


class TestTorchPort:
    def _fake_resnet34_sd(self):
        """Build a torchvision-shaped resnet34 state dict with torch core only."""
        import torch
        rng = np.random.default_rng(5)
        sd = {}

        def conv(k, o, i, s=3):
            sd[k] = torch.from_numpy(
                rng.normal(size=(o, i, s, s)).astype(np.float32) * 0.05)

        def bn(k, c):
            sd[k + '.weight'] = torch.from_numpy(
                rng.uniform(0.5, 1.5, c).astype(np.float32))
            sd[k + '.bias'] = torch.from_numpy(
                rng.normal(size=c).astype(np.float32) * 0.1)
            sd[k + '.running_mean'] = torch.from_numpy(
                rng.normal(size=c).astype(np.float32) * 0.1)
            sd[k + '.running_var'] = torch.from_numpy(
                rng.uniform(0.5, 1.5, c).astype(np.float32))

        conv('conv1.weight', 64, 3, 7)
        bn('bn1', 64)
        specs = {'layer1': (3, 64, 64), 'layer2': (4, 128, 64),
                 'layer3': (6, 256, 128), 'layer4': (3, 512, 256)}
        for name, (nblk, ch, in_ch) in specs.items():
            for i in range(nblk):
                cin = in_ch if i == 0 else ch
                conv(f'{name}.{i}.conv1.weight', ch, cin)
                bn(f'{name}.{i}.bn1', ch)
                conv(f'{name}.{i}.conv2.weight', ch, ch)
                bn(f'{name}.{i}.bn2', ch)
                if i == 0 and name != 'layer1':
                    conv(f'{name}.{i}.downsample.0.weight', ch, cin, 1)
                    bn(f'{name}.{i}.downsample.1', ch)
        return {k: v for k, v in sd.items()}

    def test_backbone_port_numerical_parity(self):
        """Ported backbone must reproduce a torch forward built from the same SD.

        Runs the flax side in f32 compute (production uses bf16; parity of the
        *weights transplant* is what's under test here)."""
        import torch
        import torch.nn as tnn
        from lc_tpu.models import layers as L
        L.set_compute_dtype(jnp.float32)
        try:
            self._run_parity_body(torch, tnn)
        finally:
            L.set_compute_dtype(jnp.bfloat16)

    def _run_parity_body(self, torch, tnn):
        sd = self._fake_resnet34_sd()
        np_sd = {k: v.numpy() for k, v in sd.items()}

        from lc_tpu.models.torch_port import resnet34_backbone_from_torch, graft
        from lc_tpu.models.resnet import ResNetBackbone

        backbone = ResNetBackbone()
        x = np.random.default_rng(6).normal(size=(1, 64, 64, 3)).astype(np.float32)
        variables = backbone.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
        p, s = resnet34_backbone_from_torch(np_sd)
        params, stats = graft(dict(variables['params']),
                              dict(variables['batch_stats']), p, s, at=())
        high, f64, f32, f16 = backbone.apply(
            {'params': params, 'batch_stats': stats}, jnp.asarray(x), False)

        # torch reference forward built inline from the same tensors
        def t_bn(name, y):
            return tnn.functional.batch_norm(
                y, sd[name + '.running_mean'], sd[name + '.running_var'],
                sd[name + '.weight'], sd[name + '.bias'], False, 0, 1e-5)

        def t_block(prefix, y):
            idn = y
            out = tnn.functional.conv2d(y, sd[prefix + '.conv1.weight'],
                                        padding=1, stride=self._stride(prefix))
            out = torch.relu(t_bn(prefix + '.bn1', out))
            out = tnn.functional.conv2d(out, sd[prefix + '.conv2.weight'], padding=1)
            out = t_bn(prefix + '.bn2', out)
            if prefix + '.downsample.0.weight' in sd:
                idn = tnn.functional.conv2d(y, sd[prefix + '.downsample.0.weight'],
                                            stride=self._stride(prefix))
                idn = t_bn(prefix + '.downsample.1', idn)
            return torch.relu(out + idn)

        y = torch.from_numpy(x.transpose(0, 3, 1, 2))
        y = torch.relu(t_bn('bn1', tnn.functional.conv2d(
            y, sd['conv1.weight'], stride=2, padding=3)))
        y = tnn.functional.max_pool2d(y, 3, 2, 1)
        feats = {}
        for name, nblk in (('layer1', 3), ('layer2', 4), ('layer3', 6),
                           ('layer4', 3)):
            for i in range(nblk):
                y = t_block(f'{name}.{i}', y)
            feats[name] = y.numpy().transpose(0, 2, 3, 1)

        # fake weights let activations grow to ~1e6: compare relatively
        np.testing.assert_allclose(np.asarray(f64), feats['layer1'],
                                   rtol=5e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(high), feats['layer4'],
                                   rtol=5e-3, atol=2e-2)

    @staticmethod
    def _stride(prefix):
        layer = prefix.split('.')[0]
        idx = int(prefix.split('.')[1])
        return 2 if (idx == 0 and layer != 'layer1') else 1
