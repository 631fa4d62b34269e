from .ptnet import PtNet, build_model, output_channel_slices
from .cdpn import ResNetCDPN
from .zebra import ZebraDeepLabV3
from .layers import upsample_bilinear_align_corners
