"""Full-checkpoint porting: every leaf of the flax tree must be covered by the
reference-layout state dict, with matching shapes (weights themselves are random —
numerical parity of the layer semantics is covered in test_models.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lc_tpu.models import build_model
from lc_tpu.models.torch_port import (port_cdpn_checkpoint,
                                      port_zebra_checkpoint, graft)

pytestmark = pytest.mark.slow  # full torch-checkpoint port roundtrip

RNG = np.random.default_rng(0)


def _fake_from_template(template: dict, to_torch_name) -> dict:
    """Given our param/stat tree, emit a torch-layout SD with matching shapes."""
    raise NotImplementedError  # not needed: we build SDs forward, see below


def _conv(sd, name, o, i, k=3):
    sd[name + '.weight'] = RNG.normal(size=(o, i, k, k)).astype(np.float32)


def _convT(sd, name, i, o, k=3):
    sd[name + '.weight'] = RNG.normal(size=(i, o, k, k)).astype(np.float32)


def _conv_b(sd, name, o, i, k=1):
    _conv(sd, name, o, i, k)
    sd[name + '.bias'] = RNG.normal(size=(o,)).astype(np.float32)


def _bn(sd, name, c):
    sd[name + '.weight'] = np.ones(c, np.float32)
    sd[name + '.bias'] = np.zeros(c, np.float32)
    sd[name + '.running_mean'] = np.zeros(c, np.float32)
    sd[name + '.running_var'] = np.ones(c, np.float32)


def _block(sd, name, o, i, stride_proj=False):
    _conv(sd, name + '.conv1', o, i)
    _bn(sd, name + '.bn1', o)
    _conv(sd, name + '.conv2', o, o)
    _bn(sd, name + '.bn2', o)
    if stride_proj:
        _conv(sd, name + '.downsample.0', o, i, 1)
        _bn(sd, name + '.downsample.1', o)


def fake_cdpn_sd(out_ch=6):
    sd = {}
    _conv(sd, 'net.backbone.conv1', 64, 3, 7)
    _bn(sd, 'net.backbone.bn1', 64)
    for name, (n, o, i) in {'layer1': (3, 64, 64), 'layer2': (4, 128, 64),
                            'layer3': (6, 256, 128),
                            'layer4': (3, 512, 256)}.items():
        for b in range(n):
            _block(sd, f'net.backbone.{name}.{b}', o, i if b == 0 else o,
                   stride_proj=(b == 0 and name != 'layer1'))
    _convT(sd, 'net.decoder.features.0', 512, 256)
    _bn(sd, 'net.decoder.features.1', 256)
    for idx in (3, 6, 10, 13, 17, 20):
        _conv(sd, f'net.decoder.features.{idx}', 256, 256)
        _bn(sd, f'net.decoder.features.{idx + 1}', 256)
    _conv_b(sd, 'net.decoder.out_layer', out_ch, 256, 1)
    sd['weight_scale_layer.weight'] = RNG.normal(size=(1, 256)).astype(np.float32)
    sd['weight_scale_layer.bias'] = np.zeros(1, np.float32)
    return sd


def fake_zebra_sd(out_ch=22):
    sd = {}
    _conv(sd, 'net.resnet.resnet_layer_1.0', 64, 3, 7)
    _bn(sd, 'net.resnet.resnet_layer_1.1', 64)
    for b in range(3):
        _block(sd, f'net.resnet.resnet_layer_2.1.{b}', 64, 64)
    for b in range(4):
        _block(sd, f'net.resnet.resnet_layer_3.0.{b}', 128, 64 if b == 0 else 128,
               stride_proj=(b == 0))
    for b in range(6):
        _block(sd, f'net.resnet.layer4.{b}', 256, 128 if b == 0 else 256,
               stride_proj=(b == 0))
    for b in range(3):
        _block(sd, f'net.resnet.layer5.{b}', 512, 256 if b == 0 else 512,
               stride_proj=(b == 0))
    for tname, k in (('conv_1x1_1', 1), ('conv_3x3_1', 3), ('conv_3x3_2', 3),
                     ('conv_3x3_3', 3), ('conv_1x1_2', 1)):
        _conv_b(sd, f'net.aspp.{tname}', 256, 512, k)
        _bn(sd, f'net.aspp.bn_{tname}', 256)
    _conv_b(sd, 'net.aspp.conv_1x1_3', 256, 1280, 1)
    _bn(sd, 'net.aspp.bn_conv_1x1_3', 256)
    for un, in_ch in (('upsample_1', 256), ('upsample_2', 256 + 64)):
        _convT(sd, f'net.aspp.{un}.0', in_ch, 256)
        _bn(sd, f'net.aspp.{un}.1', 256)
        _conv(sd, f'net.aspp.{un}.3', 256, 256)
        _bn(sd, f'net.aspp.{un}.4', 256)
        _conv(sd, f'net.aspp.{un}.6', 256, 256)
        _bn(sd, f'net.aspp.{un}.7', 256)
    _conv_b(sd, 'net.aspp.conv_1x1_4', out_ch, 256 + 64, 1)
    sd['weight_scale_layer.weight'] = RNG.normal(size=(1, 320)).astype(np.float32)
    sd['weight_scale_layer.bias'] = np.zeros(1, np.float32)
    return sd


def _tree_paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _tree_paths(v, prefix + (k,))
        else:
            out.add(prefix + (k,))
    return out


class TestFullPort:
    def test_cdpn_covers_all_leaves(self):
        model = build_model('cdpn_resnet', {'concat': False})
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                               train=False)
        p, s = port_cdpn_checkpoint(fake_cdpn_sd())
        # graft validates shapes leaf-by-leaf; missing leaves in the port would
        # remain at init values — require exact leaf-set coverage instead
        assert _tree_paths(p) == _tree_paths(dict(variables['params']))
        assert _tree_paths(s) == _tree_paths(dict(variables['batch_stats']))
        params, stats = graft(dict(variables['params']),
                              dict(variables['batch_stats']), p, s, at=())
        out = model.apply({'params': params, 'batch_stats': stats},
                          jnp.zeros((1, 64, 64, 3)), train=False)
        assert np.all(np.isfinite(np.asarray(out['xyz_noc'], np.float32)))

    def test_zebra_covers_all_leaves(self):
        model = build_model('zebra_DeepLabV3',
                            {'concat': True, 'output_kernel_size': 1},
                            total_bit_cnt=19)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                               train=False)
        p, s = port_zebra_checkpoint(fake_zebra_sd(out_ch=19 + 3))
        assert _tree_paths(p) == _tree_paths(dict(variables['params']))
        assert _tree_paths(s) == _tree_paths(dict(variables['batch_stats']))
        params, stats = graft(dict(variables['params']),
                              dict(variables['batch_stats']), p, s, at=())
        out = model.apply({'params': params, 'batch_stats': stats},
                          jnp.zeros((1, 64, 64, 3)), train=False)
        assert out['xyz_noc_bin'].shape[-1] == 19
