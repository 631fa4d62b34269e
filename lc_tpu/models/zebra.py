"""ZebraPose DeepLabV3 dense-correspondence network (Flax, NHWC).

Reference model/zebra_DeepLabV3.py: resnet34-OS8 + ASPP (rates 6/12/18 + image
pooling) + two deconv upsample stages with skip concat -> 128² output.
feature_dim = 256 + 64 (concat).

Note the concat layout (reference zebra_DeepLabV3.py:137-169): upsample_1 takes the
ASPP output 32²→64², concatenates x_64 (64 ch), upsample_2 64²→128², and the final
feature is cat(x, x_128).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, Conv, conv_init, ConvTransposeBNReLU
from .resnet import ZebraResNetOS8


class _ConvBN(nn.Module):
    features: int
    kernel: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.dilation * (self.kernel // 2)
        x = Conv(self.features, (self.kernel, self.kernel),
                    padding=((pad, pad), (pad, pad)),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=True, kernel_init=conv_init, name='conv')(x)
        x = BatchNorm(use_running_average=not train, name='bn')(x)
        return nn.relu(x)


class _UpsampleStage(nn.Module):
    """ConvT(k3,s2)+BN+ReLU then 2 × (conv3x3+BN+ReLU) (zebra_DeepLabV3.py:114-134)."""
    features: int = 256

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvTransposeBNReLU(self.features, name='deconv')(x, train)
        for j in range(2):
            x = Conv(self.features, (3, 3), padding=1, use_bias=False,
                        kernel_init=conv_init, name=f'conv{j}')(x)
            x = BatchNorm(use_running_average=not train, name=f'bn{j}')(x)
            x = nn.relu(x)
        return x


class ASPP(nn.Module):
    num_classes: int
    output_kernel_size: int = 1

    @nn.compact
    def __call__(self, high, x_128, x_64, train: bool):
        h, w = high.shape[1:3]
        b1 = _ConvBN(256, kernel=1, name='branch_1x1')(high, train)
        b2 = _ConvBN(256, kernel=3, dilation=6, name='branch_d6')(high, train)
        b3 = _ConvBN(256, kernel=3, dilation=12, name='branch_d12')(high, train)
        b4 = _ConvBN(256, kernel=3, dilation=18, name='branch_d18')(high, train)
        img = jnp.mean(high, axis=(1, 2), keepdims=True)
        img = _ConvBN(256, kernel=1, name='branch_img')(img, train)
        img = jnp.broadcast_to(img, (img.shape[0], h, w, img.shape[-1]))
        x = jnp.concatenate((b1, b2, b3, b4, img), axis=-1)
        x = _ConvBN(256, kernel=1, name='project')(x, train)

        x = _UpsampleStage(name='upsample_1')(x, train)            # 32² -> 64²
        x = jnp.concatenate((x, x_64), axis=-1)
        x = _UpsampleStage(name='upsample_2')(x, train)            # 64² -> 128²
        feature = jnp.concatenate((x, x_128), axis=-1)             # 256 + 64
        k = self.output_kernel_size
        out = Conv(self.num_classes, (k, k), padding=k // 2, use_bias=True,
                      kernel_init=conv_init, name='out_layer')(feature)
        return out, feature


class ZebraDeepLabV3(nn.Module):
    out_channels: int
    output_kernel_size: int = 1
    feature_dim: int = 256 + 64

    @nn.compact
    def __call__(self, rgb, train: bool = False):
        high, x_128, x_64, _, _ = ZebraResNetOS8(name='resnet')(rgb, train)
        out, feature = ASPP(self.out_channels, self.output_kernel_size,
                            name='aspp')(high, x_128, x_64, train)
        return out, feature
