"""Torch-weight transplantation into the Flax models.

The reference initializes its encoders from torchvision's resnet34 checkpoint
(reference model/cdpn_resnet.py:200-205, model/zebra_resnet.py:190) and ships trained
checkpoints in torch format. This module rewrites those state dicts into our flax
param/batch_stats trees. Layout conventions:

    Conv2d          weight (O, I, kH, kW)  -> kernel (kH, kW, I, O)
    ConvTranspose2d weight (I, O, kH, kW)  -> kernel (kH, kW, I, O), consumed by
                    our Deconv2x layer which stores the kernel unflipped and flips
                    spatially at application (models/layers.py; validated
                    numerically in tests/test_models.py — flax's own ConvTranspose
                    'SAME' geometry does NOT match torch).
    Linear          weight (O, I)          -> kernel (I, O)
    BatchNorm2d     weight/bias            -> scale/bias (params)
                    running_mean/var       -> mean/var (batch_stats)

Host-side numpy only; no torch import needed unless reading a .pth (lazy import).
"""
from __future__ import annotations

import numpy as np


def _conv_w(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def _convT_w(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 0, 1)


def _dense_w(w) -> np.ndarray:
    return np.asarray(w).transpose(1, 0)


def load_torch_state_dict(path: str) -> dict:
    """Read a .pth into {key: np.ndarray} (CPU)."""
    import torch  # local import: torch is host-side tooling only
    sd = torch.load(path, map_location='cpu', weights_only=False)
    if hasattr(sd, 'state_dict'):
        sd = sd.state_dict()
    if 'model' in sd and isinstance(sd['model'], dict):
        sd = sd['model']
    return {k: v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
            for k, v in sd.items()}


def _set(tree: dict, path: tuple, value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _port_bn(sd: dict, tkey: str, params: dict, stats: dict, fpath: tuple):
    _set(params, fpath + ('scale',), np.asarray(sd[tkey + '.weight']))
    _set(params, fpath + ('bias',), np.asarray(sd[tkey + '.bias']))
    _set(stats, fpath + ('mean',), np.asarray(sd[tkey + '.running_mean']))
    _set(stats, fpath + ('var',), np.asarray(sd[tkey + '.running_var']))


def _port_basic_block(sd: dict, tprefix: str, params: dict, stats: dict,
                      fpath: tuple):
    _set(params, fpath + ('conv1', 'kernel'), _conv_w(sd[tprefix + '.conv1.weight']))
    _port_bn(sd, tprefix + '.bn1', params, stats, fpath + ('bn1',))
    _set(params, fpath + ('conv2', 'kernel'), _conv_w(sd[tprefix + '.conv2.weight']))
    _port_bn(sd, tprefix + '.bn2', params, stats, fpath + ('bn2',))
    if tprefix + '.downsample.0.weight' in sd:
        _set(params, fpath + ('downsample_conv', 'kernel'),
             _conv_w(sd[tprefix + '.downsample.0.weight']))
        _port_bn(sd, tprefix + '.downsample.1', params, stats,
                 fpath + ('downsample_bn',))


def resnet34_backbone_from_torch(sd: dict, *, stages: dict | None = None
                                 ) -> tuple[dict, dict]:
    """torchvision resnet34 state dict -> (params, batch_stats) subtrees for
    ResNetBackbone / the pretrained part of ZebraResNetOS8.

    stages: {torch_layer_name: (flax_layer_name, n_blocks)}; default = the full CDPN
    backbone. For zebra pass only layer1/layer2 (layer4/layer5 are fresh).
    """
    if stages is None:
        stages = {'layer1': ('layer1', 3), 'layer2': ('layer2', 4),
                  'layer3': ('layer3', 6), 'layer4': ('layer4', 3)}
    params: dict = {}
    stats: dict = {}
    _set(params, ('stem', 'conv1', 'kernel'), _conv_w(sd['conv1.weight']))
    _port_bn(sd, 'bn1', params, stats, ('stem', 'bn1'))
    for tname, (fname, nblk) in stages.items():
        for i in range(nblk):
            _port_basic_block(sd, f'{tname}.{i}', params, stats,
                              (fname, f'block{i}'))
    return params, stats


def graft(params_tree: dict, stats_tree: dict, sub_params: dict, sub_stats: dict,
          at: tuple) -> tuple[dict, dict]:
    """Return copies of (params, batch_stats) with the subtree at `at` replaced by the
    ported weights (shape-checked leaf-by-leaf)."""
    import jax

    def merge(o, n):
        if isinstance(n, dict):
            out = dict(o)
            for k, v in n.items():
                out[k] = merge(o[k], v)
            return out
        o_arr = np.asarray(o)
        n_arr = np.asarray(n, dtype=o_arr.dtype)
        if o_arr.shape != n_arr.shape:
            raise ValueError(f'shape mismatch at graft: {o_arr.shape} vs '
                             f'{n_arr.shape}')
        return n_arr

    def replace(tree, sub, path):
        if not path:
            return merge(dict(tree), sub)
        tree = dict(tree)
        node = tree
        for p in path[:-1]:
            node[p] = dict(node[p])
            node = node[p]
        node[path[-1]] = merge(node[path[-1]], sub)
        return tree

    return replace(params_tree, sub_params, at), replace(stats_tree, sub_stats, at)


# ---------------------------------------------------------------------------
# Full PtNet checkpoint porting (reference-trained weights -> our param trees)
# ---------------------------------------------------------------------------

def _strip_prefix(sd: dict) -> dict:
    """Drop DataParallel 'module.' prefixes (reference checkpoint.py:60-73)."""
    return {k[len('module.'):] if k.startswith('module.') else k: v
            for k, v in sd.items()}


def _port_conv(sd, tkey, params, fpath, bias=False):
    _set(params, fpath + ('kernel',), _conv_w(sd[tkey + '.weight']))
    if bias:
        _set(params, fpath + ('bias',), np.asarray(sd[tkey + '.bias']))


def port_cdpn_checkpoint(sd: dict, concat: bool = False) -> tuple[dict, dict]:
    """Reference ptnet(cdpn_resnet) state dict -> (params, batch_stats).

    Torch layout (reference ptnet.py:41, model/cdpn_resnet.py): 'net.backbone.*'
    (torchvision-style resnet34), 'net.decoder.features.<idx>.*' (Sequential of
    ConvT/BN/[Upsample]/Conv blocks), 'net.decoder.out_layer.*',
    'weight_scale_layer.*'.
    """
    sd = _strip_prefix(sd)
    params: dict = {}
    stats: dict = {}

    bb = {k[len('net.backbone.'):]: v for k, v in sd.items()
          if k.startswith('net.backbone.')}
    p_bb, s_bb = resnet34_backbone_from_torch(bb)
    params['net'] = {'backbone': p_bb}
    stats['net'] = {'backbone': s_bb}

    dec_p: dict = {}
    dec_s: dict = {}
    pre = 'net.decoder.features'
    _set(dec_p, ('up0', 'deconv', 'kernel'), _convT_w(sd[f'{pre}.0.weight']))
    _port_bn(sd, f'{pre}.1', dec_p, dec_s, ('up0', 'bn'))
    # Sequential indices of the two convs/bns per stage (cdpn_resnet.py:128-156)
    if concat:
        conv_idx = {(i, j): 3 + 7 * i + 1 + 3 * j for i in range(3)
                    for j in range(2)}
    else:
        # stage 0 has no Upsample: 3,6; stages 1,2 do: 10,13 / 17,20
        conv_idx = {(0, 0): 3, (0, 1): 6, (1, 0): 10, (1, 1): 13,
                    (2, 0): 17, (2, 1): 20}
    for (i, j), idx in conv_idx.items():
        _port_conv(sd, f'{pre}.{idx}', dec_p, (f'conv{i}_{j}',))
        _port_bn(sd, f'{pre}.{idx + 1}', dec_p, dec_s, (f'bn{i}_{j}',))
    _port_conv(sd, 'net.decoder.out_layer', dec_p, ('out_layer',), bias=True)
    params['net']['decoder'] = dec_p
    stats['net']['decoder'] = dec_s

    if 'weight_scale_layer.weight' in sd:
        params['weight_scale_layer'] = {
            'kernel': _dense_w(sd['weight_scale_layer.weight']),
            'bias': np.asarray(sd['weight_scale_layer.bias'])}
    return params, stats


def port_zebra_checkpoint(sd: dict) -> tuple[dict, dict]:
    """Reference ptnet(zebra_DeepLabV3) state dict -> (params, batch_stats).

    Torch layout (model/zebra_resnet.py:171-255, model/zebra_DeepLabV3.py):
    'net.resnet.resnet_layer_1.{0,1}' = conv1/bn1, 'resnet_layer_2.1.<i>' =
    layer1 blocks, 'resnet_layer_3.0.<i>' = layer2 blocks, 'net.resnet.layer4/5'
    = dilated stages, 'net.aspp.*' = ASPP + upsamples + out conv.
    """
    sd = _strip_prefix(sd)
    params: dict = {'net': {'resnet': {}, 'aspp': {}}}
    stats: dict = {'net': {'resnet': {}, 'aspp': {}}}
    rp, rs = params['net']['resnet'], stats['net']['resnet']

    _set(rp, ('stem', 'conv1', 'kernel'),
         _conv_w(sd['net.resnet.resnet_layer_1.0.weight']))
    _port_bn(sd, 'net.resnet.resnet_layer_1.1', rp, rs, ('stem', 'bn1'))
    for i in range(3):
        _port_basic_block(sd, f'net.resnet.resnet_layer_2.1.{i}', rp, rs,
                          ('layer1', f'block{i}'))
    for i in range(4):
        _port_basic_block(sd, f'net.resnet.resnet_layer_3.0.{i}', rp, rs,
                          ('layer2', f'block{i}'))
    for i in range(6):
        _port_basic_block(sd, f'net.resnet.layer4.{i}', rp, rs,
                          ('layer4', f'block{i}'))
    for i in range(3):
        _port_basic_block(sd, f'net.resnet.layer5.{i}', rp, rs,
                          ('layer5', f'block{i}'))

    ap, as_ = params['net']['aspp'], stats['net']['aspp']
    branch_map = {'conv_1x1_1': 'branch_1x1', 'conv_3x3_1': 'branch_d6',
                  'conv_3x3_2': 'branch_d12', 'conv_3x3_3': 'branch_d18',
                  'conv_1x1_2': 'branch_img', 'conv_1x1_3': 'project'}
    for tname, fname in branch_map.items():
        _port_conv(sd, f'net.aspp.{tname}', ap, (fname, 'conv'), bias=True)
        _port_bn(sd, f'net.aspp.bn_{tname}', ap, as_, (fname, 'bn'))
    for un in ('upsample_1', 'upsample_2'):
        base = f'net.aspp.{un}'
        _set(ap, (un, 'deconv', 'deconv', 'kernel'),
             _convT_w(sd[f'{base}.0.weight']))
        _port_bn(sd, f'{base}.1', ap, as_, (un, 'deconv', 'bn'))
        _port_conv(sd, f'{base}.3', ap, (un, 'conv0'))
        _port_bn(sd, f'{base}.4', ap, as_, (un, 'bn0'))
        _port_conv(sd, f'{base}.6', ap, (un, 'conv1'))
        _port_bn(sd, f'{base}.7', ap, as_, (un, 'bn1'))
    _port_conv(sd, 'net.aspp.conv_1x1_4', ap, ('out_layer',), bias=True)

    if 'weight_scale_layer.weight' in sd:
        params['weight_scale_layer'] = {
            'kernel': _dense_w(sd['weight_scale_layer.weight']),
            'bias': np.asarray(sd['weight_scale_layer.bias'])}
    return params, stats
