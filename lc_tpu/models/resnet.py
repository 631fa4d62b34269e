"""ResNet-34 backbones (Flax linen, NHWC).

Two variants used by the pipeline (reference model/cdpn_resnet.py:20-64 and
model/zebra_resnet.py:171-255):
  * ResNetBackbone — the CDPN/GDR-Net encoder: standard resnet34 strides, exposes
    all intermediate feature maps for skip connections;
  * ZebraResNetOS8 — ZebraPose encoder: pretrained conv1..layer2 (stride 8), then
    freshly-initialized dilated stages (dilation 2 and 4, stride 1) so the output
    stays at 1/8 resolution.

Submodule names mirror the torch module paths so torch-weight porting is a pure
key-rewrite (see torch_port.py).
"""
from __future__ import annotations

from typing import Sequence

import jax
from flax import linen as nn

from . import layers
from .layers import BatchNorm, Conv, conv_init, max_pool_3x3_s2


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.dilation
        out = Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                      padding=((pad, pad), (pad, pad)),
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, kernel_init=conv_init, name='conv1')(x)
        out = BatchNorm(use_running_average=not train, name='bn1')(out)
        out = nn.relu(out)
        out = Conv(self.filters, (3, 3), padding=((pad, pad), (pad, pad)),
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, kernel_init=conv_init, name='conv2')(out)
        out = BatchNorm(use_running_average=not train, name='bn2')(out)

        if self.stride != 1 or x.shape[-1] != self.filters:
            sc = Conv(self.filters, (1, 1), strides=(self.stride, self.stride),
                         use_bias=False, kernel_init=conv_init,
                         name='downsample_conv')(x)
            sc = BatchNorm(use_running_average=not train, name='downsample_bn')(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResLayer(nn.Module):
    filters: int
    num_blocks: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.num_blocks):
            x = BasicBlock(self.filters, stride=self.stride if i == 0 else 1,
                           dilation=self.dilation, name=f'block{i}')(x, train)
        return x


class _StemConvS2D(nn.Module):
    """The stem's 7x7/s2 convolution computed as 4x4/s1 on the 2x2
    space-to-depth blocked input.

    A 7x7 conv over 3 input channels puts 3 lanes of work on a 128-lane MXU
    contraction: >97% of every tile is padding. Blocking the image 2x2 into
    12 channels and folding the stride into the blocking is the standard TPU
    reformulation (used by the MLPerf ResNet submissions): out[i,j] =
    sum_{ky,kx,c} w[ky,kx,c]·x[2i+ky-3, 2j+kx-3, c] becomes, with
    ky = 2m+dy-1 / kx = 2n+dx-1 and blocks xs[p,q,(dy,dx,c)] = x[2p+dy,2q+dx,c],
    a dense 4x4 stride-1 conv over 12 channels with padding (2,1) — the SAME
    arithmetic, term for term (the (m=0,dy=0) kernel slot is identically zero).

    The stored parameter keeps the canonical (7,7,C,features) HWIO layout —
    checkpoints, torch ports (torch_port.py) and init are unchanged; the
    rearrangement below is a trace-time transform of the weights that XLA
    constant-folds into the conv.
    """
    features: int = 64

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        w = self.param('kernel', conv_init, (7, 7, C, self.features))
        # (7,7,C,O) -> pad leading row/col -> (8,8,C,O) where [2m+dy, 2n+dx]
        # holds w[2m+dy-1, 2n+dx-1]
        wp = jax.numpy.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
        ws = wp.reshape(4, 2, 4, 2, C, self.features)          # (m,dy,n,dx,C,O)
        ws = ws.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C, self.features)
        B, H, W, _ = x.shape
        xs = x.reshape(B, H // 2, 2, W // 2, 2, C)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        dt = layers.COMPUTE_DTYPE
        return jax.lax.conv_general_dilated(
            xs.astype(dt), ws.astype(dt), window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


# measurement knob: LC_TPU_STEM_S2D=0 selects the plain strided stem conv so
# benchmarks can A/B the space-to-depth form without a code edit
import os as _os  # noqa: E402

_S2D_DEFAULT = _os.environ.get('LC_TPU_STEM_S2D', '1') != '0'


class ResNetStem(nn.Module):
    """conv7x7/s2 + BN + ReLU (the part before maxpool).

    The convolution runs in space-to-depth form on even-sized inputs (all
    production shapes; exact same arithmetic — see _StemConvS2D); the plain
    strided form is kept for odd sizes and as the `s2d=False` reference in
    tests/benchmarks. Both share the parameter path stem/conv1/kernel.
    """
    s2d: bool = _S2D_DEFAULT

    @nn.compact
    def __call__(self, x, train: bool):
        if self.s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = _StemConvS2D(name='conv1')(x)
        else:
            x = Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, kernel_init=conv_init, name='conv1')(x)
        x = BatchNorm(use_running_average=not train, name='bn1')(x)
        return nn.relu(x)


class ResNetBackbone(nn.Module):
    """resnet34 encoder for CDPN: 256² -> (8²·512, 64²·64, 32²·128, 16²·256)."""
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool):
        x = ResNetStem(name='stem')(x, train)          # /2, 64
        x = max_pool_3x3_s2(x)                         # /4
        f64 = ResLayer(64, self.layers[0], name='layer1')(x, train)      # /4, 64
        f32 = ResLayer(128, self.layers[1], stride=2, name='layer2')(f64, train)
        f16 = ResLayer(256, self.layers[2], stride=2, name='layer3')(f32, train)
        high = ResLayer(512, self.layers[3], stride=2, name='layer4')(f16, train)
        return high, f64, f32, f16


class ZebraResNetOS8(nn.Module):
    """ZebraPose resnet34-OS8: 256² -> (32²·512 high, 128²·64, 64²·64, 32²·128, 32²·256).

    Stage names keep the reference's (misleading) x_16 for the dilated layer4 output —
    it is at 1/8 resolution (reference zebra_resnet.py:234-247).
    """

    @nn.compact
    def __call__(self, x, train: bool):
        x_128 = ResNetStem(name='stem')(x, train)                       # /2, 64
        x_64 = ResLayer(64, 3, name='layer1')(max_pool_3x3_s2(x_128), train)  # /4
        x_32 = ResLayer(128, 4, stride=2, name='layer2')(x_64, train)   # /8
        x_16 = ResLayer(256, 6, dilation=2, name='layer4')(x_32, train)  # /8 dilated
        high = ResLayer(512, 3, dilation=4, name='layer5')(x_16, train)  # /8 dilated
        return high, x_128, x_64, x_32, x_16
