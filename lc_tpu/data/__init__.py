from .crop import affine_warp, batched_affine_warp, batched_separable_warp
from .model_info import load_composed_model_info, bbox3d_from_scale
from . import rle
from .bop import load_annots_from_image_list
