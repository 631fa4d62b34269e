"""PtNet: output-channel registry + confidence heads around a dense backbone.

Reference ptnet.py:9-115. Channel-last: the dense output is (B, h, w, C) with named
slices along the trailing axis; out_dict values are all channel-last.

Heads:
  * dense: NOC (3 ch) or Gray-code bits (sum(bit_cnt) ch), 2 weight-logit channels,
    1 visibility-mask channel; a global weight scale exp(Linear(mean feature));
  * sparse: per-keypoint heatmaps -> separable softargmax mean + std.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from .cdpn import ResNetCDPN
from .zebra import ZebraDeepLabV3


def output_channel_slices(sparse_cnt: int = 0, binary_bits: int = 0) -> dict:
    """Name -> slice along the channel axis (reference ptnet.py:26-38)."""
    channels = {}
    if sparse_cnt > 3:
        channels['kpt_logits'] = sparse_cnt
    else:
        noc_key = 'xyz_noc_bin' if binary_bits > 0 else 'xyz_noc'
        channels[noc_key] = binary_bits if binary_bits > 0 else 3
        channels['xyz_weights'] = 2
        channels['msk_vis'] = 1
    slices, start = {}, 0
    for k, v in channels.items():
        slices[k] = slice(start, start + v)
        start += v
    return slices


def softargmax_2d_std(prob2d: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Separable soft-argmax: prob2d (..., H, W) -> mean (..., 2), std (..., 2).

    Reference ptnet.py:85-115 (marginalize rows/cols, then 1D mean/var each).
    """
    def marginal_stats(p1d):  # (..., N)
        n = p1d.shape[-1]
        xx = jnp.arange(n, dtype=p1d.dtype)
        m = jnp.sum(xx * p1d, axis=-1)
        var = jnp.sum((xx - m[..., None]) ** 2 * p1d, axis=-1)
        return m, var

    mx, cx = marginal_stats(jnp.sum(prob2d, axis=-2))
    my, cy = marginal_stats(jnp.sum(prob2d, axis=-1))
    mean = jnp.stack((mx, my), axis=-1)
    std = jnp.sqrt(jnp.stack((cx, cy), axis=-1) + 1e-6)
    return mean, std


class PtNet(nn.Module):
    net_name: str = 'cdpn_resnet'        # 'cdpn_resnet' | 'zebra_DeepLabV3'
    sparse_cnt: int = 0
    binary_bits: int = 0
    concat: bool = False
    output_kernel_size: int = 1

    def setup(self):
        self.channel_slices = output_channel_slices(self.sparse_cnt,
                                                    self.binary_bits)
        out_ch = max(s.stop for s in self.channel_slices.values())
        if self.net_name == 'cdpn_resnet':
            self.net = ResNetCDPN(out_ch, concat=self.concat, name='net')
        elif self.net_name == 'zebra_DeepLabV3':
            self.net = ZebraDeepLabV3(out_ch, self.output_kernel_size, name='net')
        else:
            raise ValueError(f'unknown net_name {self.net_name}')
        if self.sparse_cnt <= 3:
            self.weight_scale_layer = nn.Dense(
                1, kernel_init=nn.initializers.normal(0.001),
                name='weight_scale_layer')

    def __call__(self, rgb, train: bool = False) -> dict:
        out_raw, feature = self.net(rgb, train=train)
        # heads and losses run in f32 regardless of the backbone compute dtype
        out_raw = out_raw.astype(jnp.float32)
        feature = feature.astype(jnp.float32)
        split = {k: out_raw[..., v] for k, v in self.channel_slices.items()}

        if 'kpt_logits' in split:
            logits = jnp.moveaxis(split['kpt_logits'], -1, 1)  # (B, K, h, w)
            B, Kk, h, w = logits.shape
            prob = jax.nn.softmax(logits.reshape(B, Kk, -1), axis=-1).reshape(
                B, Kk, h, w)
            pts2d, pts2d_std = softargmax_2d_std(prob)
            return {'pts2d': pts2d, 'pts2d_std': pts2d_std}

        noc_key = 'xyz_noc_bin' if self.binary_bits > 0 else 'xyz_noc'
        pooled = jnp.mean(feature, axis=(1, 2))                # (B, F)
        scale = jnp.exp(self.weight_scale_layer(pooled))       # (B, 1)
        return {
            noc_key: split[noc_key],
            'xyz_weight_logits': split['xyz_weights'],
            'xyz_weights_scale': scale[:, None, None, :],      # (B, 1, 1, 1)
            'msk_vis_logits': split['msk_vis'],
        }


def build_model(net_name: str, net_config: dict | None = None, *,
                sparse_cnt: int = 0, total_bit_cnt: int = 0) -> PtNet:
    net_config = net_config or {}
    return PtNet(net_name=net_name,
                 sparse_cnt=sparse_cnt,
                 binary_bits=total_bit_cnt,
                 concat=net_config.get('concat', net_name == 'zebra_DeepLabV3'),
                 output_kernel_size=net_config.get('output_kernel_size', 1))
