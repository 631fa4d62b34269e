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

    def replace(tree, sub, path):
        tree = dict(tree)
        node = tree
        for p in path[:-1]:
            node[p] = dict(node[p])
            node = node[p]
        old = node[path[-1]]

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

        node[path[-1]] = merge(old, sub)
        return tree

    return replace(params_tree, sub_params, at), replace(stats_tree, sub_stats, at)
