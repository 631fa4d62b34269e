"""Affine crop math for DZI (dynamic zoom-in) ROI crops.

Re-derivation of the reference's CenterNet-style 3-point affine construction
(reference dataset.py:61-108, _get_affine_transform): the crop maps a square ROI of
side `scale`, centered at `center`, rotated by `rot_rad`, onto an output_size image,
fitting the ROI width to the output width.

Instead of solving a 3-point linear system (cv2.getAffineTransform), we compose the
transform in closed form — identical result, trivially batchable, and usable both
host-side (numpy) and device-side (jnp):

    A = T(out_w/2, out_h/2) · S(out_w/scale) · Rot(-rot) · T(-cx - sx, -cy - sy)

where (sx, sy) = scale * shift. The reference's src triangle is
{c, c + R·(0, -s/2), c + R·(-s/2... )} and dst {(w/2,h/2), (w/2, h/2 - w/2), ...},
which is exactly this similarity transform.
"""
from __future__ import annotations

import numpy as np


def crop_affine(center, scale, rot_rad, output_size, shift=(0.0, 0.0), xp=np):
    """Build the 2x3 affine mapping full-image pixels -> crop pixels.

    center: (..., 2) ROI center (cx, cy) in source pixels
    scale:  (...,) ROI square side in source pixels
    rot_rad: (...,) in-plane rotation (radians)
    output_size: (out_w, out_h) static ints
    shift: (..., 2) relative shift in units of scale
    Returns (..., 2, 3) affine.
    """
    center = xp.asarray(center, dtype=xp.float32)
    scale = xp.asarray(scale, dtype=xp.float32)
    rot_rad = xp.asarray(rot_rad, dtype=xp.float32)
    shift = xp.asarray(shift, dtype=xp.float32)
    out_w, out_h = (output_size, output_size) if isinstance(output_size, (int, float)) \
        else output_size

    src_c = center + scale[..., None] * shift  # (..., 2)
    s = out_w / scale  # (...,)
    cos, sin = xp.cos(rot_rad), xp.sin(rot_rad)
    # The reference maps the +rot-rotated source direction onto the unrotated dst axis
    # (get_dir at dataset.py:83-86), so the linear part is s · Rot(-rot); the third
    # perpendicular point is consistent automatically since rotations/uniform scales
    # commute with the 90° perp used by get_3rd_point.
    a00 = s * cos
    a01 = s * sin
    a10 = -s * sin
    a11 = s * cos
    b0 = out_w * 0.5 - (a00 * src_c[..., 0] + a01 * src_c[..., 1])
    b1 = out_h * 0.5 - (a10 * src_c[..., 0] + a11 * src_c[..., 1])
    rows = xp.stack((a00, a01, b0, a10, a11, b1), axis=-1)
    return rows.reshape(rows.shape[:-1] + (2, 3))


def invert_affine(aff, xp=np):
    """Invert a (..., 2, 3) affine."""
    A = aff[..., :2]
    b = aff[..., 2]
    det = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    inv00 = A[..., 1, 1] / det
    inv01 = -A[..., 0, 1] / det
    inv10 = -A[..., 1, 0] / det
    inv11 = A[..., 0, 0] / det
    ib0 = -(inv00 * b[..., 0] + inv01 * b[..., 1])
    ib1 = -(inv10 * b[..., 0] + inv11 * b[..., 1])
    rows = xp.stack((inv00, inv01, ib0, inv10, inv11, ib1), axis=-1)
    return rows.reshape(rows.shape[:-1] + (2, 3))


def affine33(aff, xp=np):
    """Lift (..., 2, 3) -> (..., 3, 3) homogeneous (for K composition, dataset.py:421-423)."""
    pad_shape = aff.shape[:-2] + (1, 3)
    last = xp.broadcast_to(xp.asarray([0.0, 0.0, 1.0], dtype=aff.dtype), pad_shape)
    return xp.concatenate((aff, last), axis=-2)
