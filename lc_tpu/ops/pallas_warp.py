"""Rotated-crop warp as a Pallas shear kernel (the last gather-bound image op).

TPUs have no hardware gather: a general affine warp via per-pixel gathers runs
~100× slower than compute (measured 380 ms for a 32×256² batch). Axis-aligned
crops are separable interpolation matmuls (data/crop.py); rotation is handled here
with the classic three-shear decomposition

    R(θ) = ShearX(α) · ShearY(β) · ShearX(α),  α = −tan(θ/2), β = sin(θ)

after folding 90°-multiples into cheap transposes/flips so |θ| ≤ π/4. Each shear
pass shifts every row (or column) by a *row-constant* fractional offset — exactly
the access pattern Pallas handles natively: one dynamic-slice (`pl.ds`) per row
from VMEM plus a lerp, vectorized across the row. Grid = (batch, rows); no
gathers anywhere.

Pipeline for a rotated crop: axis-aligned separable warp into a √2-padded
intermediate at output scale (matmuls) → three shear passes (this kernel) →
central crop. Exposed as `rotated_crop_warp`; `shear_x_pallas` is the building
block. A pure-jnp reference (`shear_x_reference`) backs CPU tests.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from ..data.crop import batched_separable_warp


def shear_x_reference(img: jax.Array, shifts: jax.Array) -> jax.Array:
    """Pure-jnp per-row horizontal fractional shift (zero padding outside).

    img: (B, H, W, C); shifts: (B, H) source offset per output row:
    out[b, y, x] = img[b, y, x + shifts[b, y]] (bilinear in x).
    """
    B, H, W, C = img.shape
    x = jnp.arange(W, dtype=jnp.float32)
    src = x[None, None, :] + shifts[..., None]                # (B, H, W)
    x0 = jnp.floor(src)
    f = (src - x0)[..., None]
    x0i = x0.astype(jnp.int32)

    def tap(xi):
        ok = (xi >= 0) & (xi < W)
        v = jnp.take_along_axis(img, jnp.clip(xi, 0, W - 1)[..., None]
                                .repeat(C, -1), axis=2)
        return v * ok[..., None]

    return tap(x0i) * (1.0 - f) + tap(x0i + 1) * f


def _shear_kernel(shift_ref, img_ref, out_ref):
    """One (batch, row) program: fractional dynamic-slice shift of a padded row.

    img_ref: (1, 1, Wpad, C) the padded source row in VMEM; shift_ref: the FULL
    (B, H) shift array in SMEM — Mosaic requires block dims divisible by (8, 128)
    or equal to the array dims, so partial scalar blocks like (1, 1) are rejected;
    instead the whole (tiny) shift table is resident and indexed by program_id.
    out_ref: (1, 1, W, C).
    """
    import jax.experimental.pallas as pl

    W = out_ref.shape[2]
    shift = shift_ref[pl.program_id(0), pl.program_id(1)]
    base = jnp.floor(shift)
    frac = shift - base
    start = base.astype(jnp.int32) + (img_ref.shape[2] - W) // 2  # pad offset
    row0 = img_ref[0, 0, pl.dslice(start, W), :]
    row1 = img_ref[0, 0, pl.dslice(start + 1, W), :]
    out_ref[0, 0, :, :] = row0 * (1.0 - frac) + row1 * frac


@functools.partial(jax.jit, static_argnames=('interpret',))
def shear_x_pallas(img: jax.Array, shifts: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """Per-row horizontal fractional shift via Pallas dynamic slices.

    img: (B, H, W, C) f32; shifts: (B, H) f32 with |shift| < W//2 (the input is
    zero-padded by W//2 + 1 on both sides, so out-of-range taps read zeros).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = img.shape
    pad = W // 2 + 2
    padded = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    Wpad = W + 2 * pad

    grid = (B, H)
    out = pl.pallas_call(
        _shear_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, H), lambda b, y: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Wpad, C), lambda b, y: (b, y, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, W, C), lambda b, y: (b, y, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), img.dtype),
        interpret=interpret,
    )(shifts.astype(jnp.float32), padded)
    return out


def _fold_quadrant(theta):
    """Split θ = quadrant·(π/2) + residual with residual in [-π/4, π/4]."""
    q = jnp.round(theta / (math.pi / 2.0))
    return q.astype(jnp.int32) % 4, theta - q * (math.pi / 2.0)


def _apply_quadrant(img: jax.Array, q: jax.Array) -> jax.Array:
    """Resample map m -> Rot(q·90°)·(m − H/2) + H/2 via transposes/flips.

    The flips alone rotate about the pixel-center (H−1)/2; the convention here
    centers at H/2 (matching crop_affine), which differs by an exactly-integer
    shift per quadrant — applied with jnp.roll (the wrapped border lies outside
    the final central crop)."""
    r0 = img
    r1 = jnp.roll(jnp.flip(jnp.swapaxes(img, 1, 2), axis=1), 1, axis=1)   # 90°
    r2 = jnp.roll(jnp.flip(jnp.flip(img, axis=1), axis=2), (1, 1), (1, 2))  # 180°
    r3 = jnp.roll(jnp.flip(jnp.swapaxes(img, 1, 2), axis=2), 1, axis=2)   # 270°
    stack = jnp.stack((r0, r1, r2, r3))              # (4, B, H, W, C)
    return jnp.take_along_axis(
        stack, q[None, :, None, None, None], axis=0)[0]


def rotated_crop_warp(imgs: jax.Array, center: jax.Array, scale: jax.Array,
                      rot_rad: jax.Array, out_wh: tuple, *,
                      use_pallas: bool | None = None) -> jax.Array:
    """Full DZI crop with rotation, gather-free.

    imgs: (B, H, W, C) f32; center (B, 2); scale (B,); rot_rad (B,).
    Equivalent to cv2.warpAffine(img, crop_affine(center, scale, rot), out_wh)
    up to resampling differences (two-stage resampling vs direct; the intermediate
    is 1.5× the output resolution so the quality loss is marginal).
    use_pallas=None auto-selects: Pallas kernel on TPU, pure-jnp shears elsewhere.
    """
    out_w, out_h = out_wh
    assert out_w == out_h, 'square crops only'
    B = imgs.shape[0]
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform in ('tpu', 'axon')

    q, theta = _fold_quadrant(rot_rad)

    # stage 1: axis-aligned crop to a 1.5× intermediate (covers the rotated
    # support of the output square for |θ| ≤ π/4 plus shear padding)
    inter = int(out_w * 1.5)
    from ..geom.affine import crop_affine
    aff = crop_affine(center, scale * 1.5, jnp.zeros_like(scale), (inter, inter),
                      xp=jnp)
    mid = batched_separable_warp(imgs, aff, (inter, inter), 'bilinear')

    # stage 2: fold 90° multiples into flips/transposes
    mid = _apply_quadrant(mid, q)

    # stage 3: residual rotation about the intermediate center by three shears.
    # To sample out(x) = mid(R(θ)·x) (content rotates by -θ... convention below
    # matches crop_affine, validated in tests), use R(θ) = Sx(α) Sy(β) Sx(α).
    alpha = -jnp.tan(theta / 2.0)
    beta = jnp.sin(theta)
    # rotation center: crop_affine maps the ROI center to (inter/2, inter/2)
    # exactly (between pixels), not the center pixel (inter-1)/2
    cy = inter / 2.0
    rows = jnp.arange(inter, dtype=jnp.float32) - cy          # (inter,)

    shear = shear_x_pallas if use_pallas else shear_x_reference

    def shear_y(img, s):
        return jnp.swapaxes(shear(jnp.swapaxes(img, 1, 2), s), 1, 2)

    sx = alpha[:, None] * rows[None, :]                       # (B, inter)
    sy = beta[:, None] * rows[None, :]
    mid = shear(mid, sx)
    mid = shear_y(mid, sy)
    mid = shear(mid, sx)

    # stage 4: central crop back to the output size
    off = (inter - out_h) // 2
    return mid[:, off:off + out_h, off:off + out_w, :]
