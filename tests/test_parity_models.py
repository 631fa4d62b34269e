"""Full-model forward parity: reference torch architectures -> torch_port ->
flax models, compared on real activations with random weights AND random
BatchNorm running stats.

The reference model files import torchvision/mmcv (absent in this image), so
the architectures are replicated here verbatim in plain torch:
  * RefResNetCDPN == model/cdpn_resnet.py:20-216 (ResNetBackbone + Decoder,
    concat and no-concat variants; torchvision BasicBlock vendored below)
  * RefDeepLabV3 == model/zebra_DeepLabV3.py:28-169 + model/zebra_resnet.py
    ResNet_BasicBlock_OS8 (concat path, as the zebra configs use)
State dicts flow through lc_tpu.models.torch_port exactly as a reference
checkpoint would; outputs must agree to f32 resolution.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from lc_tpu.models.cdpn import ResNetCDPN
from lc_tpu.models.zebra import ZebraDeepLabV3
from lc_tpu.models import layers as mlayers
from lc_tpu.models.torch_port import (port_cdpn_checkpoint,
                                      port_zebra_checkpoint)

RNG = np.random.default_rng(41)


@pytest.fixture(scope="module", autouse=True)
def _f32_compute():
    """The CNNs compute in bf16 on the MXU by default; torch-parity needs f32."""
    old = mlayers.COMPUTE_DTYPE
    mlayers.set_compute_dtype(jnp.float32)
    yield
    mlayers.set_compute_dtype(old)


# ---------------------------------------------------------------------------
# torchvision BasicBlock (vendored; torchvision.models.resnet semantics)
# ---------------------------------------------------------------------------

class TVBasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


# --- reference model/cdpn_resnet.py replica --------------------------------

class RefResNetBackbone(tnn.Module):
    """model/cdpn_resnet.py:20-64 with resnet34 spec."""

    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))
        out = [TVBasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        out += [TVBasicBlock(planes, planes) for _ in range(1, blocks)]
        return tnn.Sequential(*out)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        f64 = self.layer1(x)
        f32 = self.layer2(f64)
        f16 = self.layer3(f32)
        high = self.layer4(f16)
        return high, f64, f32, f16


class RefDecoder(tnn.Module):
    """model/cdpn_resnet.py:67-188 (kernel_size=3, output_kernel_size=1)."""

    def __init__(self, in_channels, out_channels, num_filters=256, concat=False):
        super().__init__()
        self.concat = concat
        channels = [64, 64, 128, 256, 512]
        feats = [tnn.ConvTranspose2d(in_channels, num_filters, 3, 2, 1,
                                     output_padding=1, bias=False),
                 tnn.BatchNorm2d(num_filters), tnn.ReLU(inplace=True)]
        for i in range(3):
            if concat:
                feats.append(tnn.UpsamplingBilinear2d(scale_factor=2))
                in0 = num_filters + channels[-2 - i]
            else:
                if i >= 1:
                    feats.append(tnn.UpsamplingBilinear2d(scale_factor=2))
                in0 = num_filters
            feats += [tnn.Conv2d(in0, num_filters, 3, 1, 1, bias=False),
                      tnn.BatchNorm2d(num_filters), tnn.ReLU(inplace=True),
                      tnn.Conv2d(num_filters, num_filters, 3, 1, 1, bias=False),
                      tnn.BatchNorm2d(num_filters), tnn.ReLU(inplace=True)]
        self.features = tnn.ModuleList(feats)
        self.out_layer = tnn.Conv2d(num_filters, out_channels, 1, bias=True)

    def forward(self, x, f64, f32, f16):
        if self.concat:
            # NOTE: the reference forward cats at indices 3/12/21
            # (cdpn_resnet.py:176-182), but its ModuleList has 7 modules per
            # stage, putting stage boundaries at 3/10/17 — running it crashes
            # with a channel mismatch at index 11. No reference config uses
            # cdpn concat (all five set concat:false for cdpn; zebra's concat
            # is a different class), so this is dead code with a latent bug.
            # We replicate the *intended* semantics (cat at each stage start),
            # which is what lc_tpu's CDPNDecoder(concat=True) implements.
            for i, l in enumerate(self.features):
                if i == 3:
                    x = torch.cat([x, f16], 1)
                elif i == 10:
                    x = torch.cat([x, f32], 1)
                elif i == 17:
                    x = torch.cat([x, f64], 1)
                x = l(x)
        else:
            for l in self.features:
                x = l(x)
        return self.out_layer(x), x


class RefResNetCDPN(tnn.Module):
    def __init__(self, out_channels, concat):
        super().__init__()
        self.backbone = RefResNetBackbone()
        self.decoder = RefDecoder(512, out_channels, concat=concat)

    def forward(self, rgb):
        high, f64, f32, f16 = self.backbone(rgb)
        return self.decoder(high, f64, f32, f16)


# --- reference zebra replica ------------------------------------------------

class ZebraBasicBlock(tnn.Module):
    """model/zebra_resnet.py:21-52 (dilated; empty-Sequential downsample)."""
    expansion = 1

    def __init__(self, in_channels, channels, stride=1, dilation=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_channels, channels, 3, stride, dilation,
                                dilation=dilation, bias=False)
        self.bn1 = tnn.BatchNorm2d(channels)
        self.conv2 = tnn.Conv2d(channels, channels, 3, 1, dilation,
                                dilation=dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(channels)
        if stride != 1 or in_channels != channels:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_channels, channels, 1, stride, bias=False),
                tnn.BatchNorm2d(channels))
        else:
            self.downsample = tnn.Sequential()

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + self.downsample(x))


def _zebra_layer(in_ch, ch, blocks, dilation):
    mods = [ZebraBasicBlock(in_ch, ch, 1, dilation)]
    mods += [ZebraBasicBlock(ch, ch, 1, dilation) for _ in range(1, blocks)]
    return tnn.Sequential(*mods)


class RefZebraResNetOS8(tnn.Module):
    """ResNet_BasicBlock_OS8(34, concat=True) (zebra_resnet.py:171-247).

    resnet_layer_1/2/3 mirror the torchvision children slices: [conv1,bn1,relu],
    [maxpool, layer1], [layer2]."""

    def __init__(self):
        super().__init__()
        conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        bn1 = tnn.BatchNorm2d(64)
        self.resnet_layer_1 = tnn.Sequential(conv1, bn1, tnn.ReLU(inplace=True))
        layer1 = tnn.Sequential(*[TVBasicBlock(64, 64) for _ in range(3)])
        self.resnet_layer_2 = tnn.Sequential(tnn.MaxPool2d(3, 2, 1), layer1)
        l2_blocks = [TVBasicBlock(64, 128, 2, tnn.Sequential(
            tnn.Conv2d(64, 128, 1, 2, bias=False), tnn.BatchNorm2d(128)))]
        l2_blocks += [TVBasicBlock(128, 128) for _ in range(3)]
        self.resnet_layer_3 = tnn.Sequential(tnn.Sequential(*l2_blocks))
        self.layer4 = _zebra_layer(128, 256, 6, dilation=2)
        self.layer5 = _zebra_layer(256, 512, 3, dilation=4)

    def forward(self, x):
        x_128 = self.resnet_layer_1(x)
        x_64 = self.resnet_layer_2(x_128)
        x_32 = self.resnet_layer_3(x_64)
        x_16 = self.layer4(x_32)
        high = self.layer5(x_16)
        return high, x_128, x_64, x_32, x_16


class RefASPP(tnn.Module):
    """model/zebra_DeepLabV3.py:59-169 (concat=True, output_kernel_size=1)."""

    def __init__(self, num_classes):
        super().__init__()
        self.conv_1x1_1 = tnn.Conv2d(512, 256, 1)
        self.bn_conv_1x1_1 = tnn.BatchNorm2d(256)
        self.conv_3x3_1 = tnn.Conv2d(512, 256, 3, 1, 6, dilation=6)
        self.bn_conv_3x3_1 = tnn.BatchNorm2d(256)
        self.conv_3x3_2 = tnn.Conv2d(512, 256, 3, 1, 12, dilation=12)
        self.bn_conv_3x3_2 = tnn.BatchNorm2d(256)
        self.conv_3x3_3 = tnn.Conv2d(512, 256, 3, 1, 18, dilation=18)
        self.bn_conv_3x3_3 = tnn.BatchNorm2d(256)
        self.avg_pool = tnn.AdaptiveAvgPool2d(1)
        self.conv_1x1_2 = tnn.Conv2d(512, 256, 1)
        self.bn_conv_1x1_2 = tnn.BatchNorm2d(256)
        self.conv_1x1_3 = tnn.Conv2d(1280, 256, 1)
        self.bn_conv_1x1_3 = tnn.BatchNorm2d(256)

        def upsample(in_ch):
            return tnn.Sequential(
                tnn.ConvTranspose2d(in_ch, 256, 3, 2, 1, output_padding=1,
                                    bias=False),
                tnn.BatchNorm2d(256), tnn.ReLU(inplace=True),
                tnn.Conv2d(256, 256, 3, 1, 1, bias=False),
                tnn.BatchNorm2d(256), tnn.ReLU(inplace=True),
                tnn.Conv2d(256, 256, 3, 1, 1, bias=False),
                tnn.BatchNorm2d(256), tnn.ReLU(inplace=True))

        self.upsample_1 = upsample(256)
        self.upsample_2 = upsample(256 + 64)
        self.conv_1x1_4 = tnn.Conv2d(256 + 64, num_classes, 1)

    def forward(self, high, x_128, x_64):
        h, w = high.shape[2:]
        o1 = F.relu(self.bn_conv_1x1_1(self.conv_1x1_1(high)))
        o2 = F.relu(self.bn_conv_3x3_1(self.conv_3x3_1(high)))
        o3 = F.relu(self.bn_conv_3x3_2(self.conv_3x3_2(high)))
        o4 = F.relu(self.bn_conv_3x3_3(self.conv_3x3_3(high)))
        oi = F.relu(self.bn_conv_1x1_2(self.conv_1x1_2(self.avg_pool(high))))
        oi = F.interpolate(oi, size=(h, w), mode="bilinear")
        x = torch.cat([o1, o2, o3, o4, oi], 1)
        x = F.relu(self.bn_conv_1x1_3(self.conv_1x1_3(x)))
        x = self.upsample_1(x)
        x = torch.cat([x, x_64], 1)
        x = self.upsample_2(x)
        feature = torch.cat([x, x_128], 1)
        return self.conv_1x1_4(feature), feature


class RefDeepLabV3(tnn.Module):
    def __init__(self, num_classes):
        super().__init__()
        self.resnet = RefZebraResNetOS8()
        self.aspp = RefASPP(num_classes)

    def forward(self, x):
        high, x_128, x_64, _, _ = self.resnet(x)
        return self.aspp(high, x_128, x_64)


# ---------------------------------------------------------------------------
# randomization + comparison helpers
# ---------------------------------------------------------------------------

def randomize(model: tnn.Module):
    """Random weights and — crucially — random BN running stats, so a BN
    stats/param mix-up in the port cannot cancel out."""
    sd = model.state_dict()
    new = {}
    for k, v in sd.items():
        if k.endswith('num_batches_tracked'):
            new[k] = v
        elif k.endswith('running_mean'):
            new[k] = torch.from_numpy(
                RNG.normal(0, 0.2, v.shape).astype(np.float32))
        elif k.endswith('running_var'):
            new[k] = torch.from_numpy(
                RNG.uniform(0.5, 1.5, v.shape).astype(np.float32))
        elif '.bn' in k or 'bn_' in k or 'downsample.1' in k:
            if k.endswith('weight'):
                new[k] = torch.from_numpy(
                    RNG.uniform(0.5, 1.5, v.shape).astype(np.float32))
            else:
                new[k] = torch.from_numpy(
                    RNG.normal(0, 0.1, v.shape).astype(np.float32))
        else:
            fan_in = int(np.prod(v.shape[1:])) if v.ndim > 1 else 1
            new[k] = torch.from_numpy(
                (RNG.normal(0, 1, v.shape) / np.sqrt(max(fan_in, 1))
                 ).astype(np.float32))
    model.load_state_dict(new)
    model.eval()


def compare(out_t: torch.Tensor, out_j, what: str, tol=2e-3):
    """Relative-to-signal comparison: f32 through ~40 conv/BN layers."""
    a = np.moveaxis(np.asarray(out_j), -1, 1)
    b = out_t.detach().numpy()
    assert a.shape == b.shape, (what, a.shape, b.shape)
    scale = max(np.std(b), 1e-6)
    worst = np.max(np.abs(a - b)) / scale
    assert worst < tol, f"{what}: max |diff|/std = {worst:.2e}"


@pytest.mark.parametrize("concat", [False, True])
def test_cdpn_full_forward(concat):
    out_ch = 6
    tmodel = RefResNetCDPN(out_ch, concat=concat)
    randomize(tmodel)
    sd = {'net.' + k: v.numpy() for k, v in tmodel.state_dict().items()}

    params, stats = port_cdpn_checkpoint(sd, concat=concat)
    jmodel = ResNetCDPN(out_channels=out_ch, concat=concat)

    x = RNG.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out_t, feat_t = tmodel(torch.from_numpy(x))
    out_j, feat_j = jmodel.apply(
        {'params': params['net'], 'batch_stats': stats['net']},
        jnp.asarray(np.moveaxis(x, 1, -1)), train=False)
    compare(out_t, out_j, f"cdpn(concat={concat}) out")
    compare(feat_t, feat_j, f"cdpn(concat={concat}) feature")


def test_zebra_full_forward():
    out_ch = 17
    tmodel = RefDeepLabV3(out_ch)
    randomize(tmodel)
    sd = {'net.' + k: v.numpy() for k, v in tmodel.state_dict().items()}

    params, stats = port_zebra_checkpoint(sd)
    jmodel = ZebraDeepLabV3(out_channels=out_ch)

    x = RNG.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out_t, feat_t = tmodel(torch.from_numpy(x))
    out_j, feat_j = jmodel.apply(
        {'params': params['net'], 'batch_stats': stats['net']},
        jnp.asarray(np.moveaxis(x, 1, -1)), train=False)
    compare(out_t, out_j, "zebra out")
    compare(feat_t, feat_j, "zebra feature")
