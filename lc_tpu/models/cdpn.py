"""CDPN/GDR-Net dense-correspondence network (Flax, NHWC).

Reference model/cdpn_resnet.py:67-216: resnet34 encoder + a deconv/upsample decoder
producing a 64² dense output (128² with skip-concat). feature_dim = 256.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import (BatchNorm, Conv, conv_init,
                     upsample_bilinear_align_corners, ConvTransposeBNReLU)
from .resnet import ResNetBackbone

# resnet34 per-stage channels, for skip-concat widths (reference resnet_spec)
_RESNET34_CHANNELS = (64, 64, 128, 256, 512)


class CDPNDecoder(nn.Module):
    out_channels: int
    num_layers: int = 3
    num_filters: int = 256
    concat: bool = False
    output_kernel_size: int = 1

    @nn.compact
    def __call__(self, x, skips, train: bool):
        """x: 8²·512 encoder output; skips = (f64, f32, f16)."""
        f64, f32, f16 = skips
        x = ConvTransposeBNReLU(self.num_filters, name='up0')(x, train)  # 16²
        if self.concat:
            concat_feats = (f16, f32, f64)
            for i in range(self.num_layers):
                x = jnp.concatenate((x, concat_feats[i]), axis=-1)
                x = upsample_bilinear_align_corners(x)
                for j in range(2):
                    x = Conv(self.num_filters, (3, 3), padding=1, use_bias=False,
                                kernel_init=conv_init, name=f'conv{i}_{j}')(x)
                    x = BatchNorm(use_running_average=not train,
                                  name=f'bn{i}_{j}')(x)
                    x = nn.relu(x)
        else:
            for i in range(self.num_layers):
                if i >= 1:
                    x = upsample_bilinear_align_corners(x)
                for j in range(2):
                    x = Conv(self.num_filters, (3, 3), padding=1, use_bias=False,
                                kernel_init=conv_init, name=f'conv{i}_{j}')(x)
                    x = BatchNorm(use_running_average=not train,
                                  name=f'bn{i}_{j}')(x)
                    x = nn.relu(x)
        k = self.output_kernel_size
        out = Conv(self.out_channels, (k, k), padding=k // 2, use_bias=True,
                      kernel_init=conv_init, name='out_layer')(x)
        return out, x


class ResNetCDPN(nn.Module):
    out_channels: int
    concat: bool = False
    feature_dim: int = 256

    @nn.compact
    def __call__(self, rgb, train: bool = False):
        high, f64, f32, f16 = ResNetBackbone(name='backbone')(rgb, train)
        out, feature = CDPNDecoder(self.out_channels, concat=self.concat,
                                   name='decoder')(high, (f64, f32, f16), train)
        return out, feature
