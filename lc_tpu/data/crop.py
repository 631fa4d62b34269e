"""Device-side affine ROI cropping (the cv2.warpAffine replacement).

The reference warps every crop on CPU inside DataLoader workers (3 warpAffines per
sample, dataset.py:409-444). Here the warp is a jit-compiled batched gather+lerp on
device: the host ships the full image once and all crops (input RGB, output-res
masks, homo_z) are cut on-chip, which is the big input-pipeline win on TPU.

Convention matches cv2.warpAffine(dst_size, M): M maps source pixels to destination
pixels; we evaluate dst(x) = src(M⁻¹x) with bilinear or nearest sampling and zero
padding outside the source.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geom.affine import invert_affine


def _sample_bilinear(img: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    """img (H, W, C); xs, ys (h, w) source coords. Zero outside."""
    H, W = img.shape[:2]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[..., None]
    fy = (ys - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return v * valid[..., None]

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def _sample_nearest(img: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    H, W = img.shape[:2]
    xi = jnp.round(xs).astype(jnp.int32)
    yi = jnp.round(ys).astype(jnp.int32)
    valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
    return v * valid[..., None]


@functools.partial(jax.jit, static_argnames=('out_hw', 'method'))
def affine_warp(img: jax.Array, affine: jax.Array, out_hw: tuple,
                method: str = 'bilinear') -> jax.Array:
    """Warp one image. img (H, W, C); affine (2, 3) source->dst; out (h, w, C)."""
    h, w = out_hw
    inv = invert_affine(affine, xp=jnp)
    xs_d = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys_d = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = inv[0, 0] * xs_d + inv[0, 1] * ys_d + inv[0, 2]
    ys = inv[1, 0] * xs_d + inv[1, 1] * ys_d + inv[1, 2]
    if method == 'bilinear':
        return _sample_bilinear(img, xs, ys)
    return _sample_nearest(img, xs, ys)


@functools.partial(jax.jit, static_argnames=('out_hw', 'method'))
def batched_affine_warp(imgs: jax.Array, affines: jax.Array, out_hw: tuple,
                        method: str = 'bilinear') -> jax.Array:
    """imgs (B, H, W, C), affines (B, 2, 3) -> (B, h, w, C). General affines
    (gather-based; slow on TPU — prefer batched_separable_warp for axis-aligned
    crops, which is the common case)."""
    return jax.vmap(lambda im, af: affine_warp(im, af, out_hw, method))(
        imgs, affines)


def _interp_matrix(inv_a: jax.Array, inv_b: jax.Array, n_out: int, n_src: int,
                   method: str) -> jax.Array:
    """Per-crop 1D resampling matrix W (..., n_out, n_src) for
    src_coord = inv_a · out_coord + inv_b. Bilinear = tent weights (zero outside
    the source, matching cv2's constant-0 border); nearest = one-hot at round."""
    o = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_src), 0)
    i = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_src), 1)
    src = inv_a[..., None, None] * o + inv_b[..., None, None]
    if method == 'bilinear':
        return jnp.maximum(0.0, 1.0 - jnp.abs(src - i))
    return (jnp.round(src) == i).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=('out_hw', 'method',
                                              'compute_dtype'))
def batched_separable_warp(imgs: jax.Array, affines: jax.Array, out_hw: tuple,
                           method: str = 'bilinear',
                           compute_dtype=None) -> jax.Array:
    """Axis-aligned affine crop as two interpolation matmuls (MXU work instead of
    gathers — TPUs have no hardware gather, making the general warp ~100× slower).
    Requires affines with zero off-diagonal linear part (no rotation): the crop is
    a per-sample scale + translate, so resampling is separable:
        out = W_y · img · W_xᵀ  per channel.
    imgs (B, H, W, C), affines (B, 2, 3) -> (B, h, w, C).

    compute_dtype=jnp.bfloat16 runs the two matmuls in one MXU pass instead of
    the global f32 (bf16x3) policy — right for 8-bit RGB (max error ~0.4 of an
    intensity step), wrong for homo_z/depth warps (values ~1e5, bf16 rel error
    ~0.4%); output is cast back to the input dtype."""
    h, w = out_hw
    H, W = imgs.shape[1:3]
    inv = invert_affine(affines, xp=jnp)                 # (B, 2, 3)
    Wy = _interp_matrix(inv[:, 1, 1], inv[:, 1, 2], h, H, method)  # (B, h, H)
    Wx = _interp_matrix(inv[:, 0, 0], inv[:, 0, 2], w, W, method)  # (B, w, W)
    out_dtype = imgs.dtype
    if compute_dtype is not None:
        imgs = imgs.astype(compute_dtype)
        Wy = Wy.astype(compute_dtype)
        Wx = Wx.astype(compute_dtype)
    tmp = jnp.einsum('boh,bhwc->bowc', Wy, imgs)
    out = jnp.einsum('bow,bhwc->bhoc', Wx, tmp)
    return out.astype(out_dtype) if compute_dtype is not None else out
