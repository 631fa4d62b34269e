"""Inference-time PnP solving: decode -> point selection -> RANSAC -> weighted LM.

Semantics match reference test.py:39-136 (solve_pnp / solve_pnp_dense /
quantile_msk), fully on-device and batched: the reference's per-instance host pools
(cv2 RANSAC in multiprocessing, Ceres via OpenMP) become two jit-compiled batched
solvers; the reference's variable-length `nonzero` point selection becomes validity
masks over the fixed dense grid (weights of dropped points are simply masked out,
which the weighted solvers honor exactly).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .geom.projection import gen_uv
from .loss.targets import nn_out_to_xyz
from .pnp.ransac import ransac_pnp
from .pnp.solver import lm_refine_auto as lm_refine


def quantile_mask(den_inv_std2d: jax.Array, quantile) -> jax.Array:
    """Keep points whose summed weight is >= the per-sample quantile
    (reference test.py:39-45). den_inv_std2d: (B, N, 2); quantile scalar or (B,)."""
    w = jnp.sum(den_inv_std2d, axis=-1)                       # (B, N)
    n = w.shape[-1]
    q = jnp.asarray(quantile, w.dtype)
    if q.ndim == 0:
        q = jnp.broadcast_to(q, w.shape[:1])
    # one ascending sort + linear interpolation (numpy 'linear' quantile semantics,
    # matching torch.quantile in the reference) — cheaper than jnp.quantile's
    # per-q path and handles per-sample q uniformly
    sw = jnp.sort(w, axis=-1)
    pos = q * (n - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    frac = (pos - lo.astype(w.dtype))[:, None]
    v_lo = jnp.take_along_axis(sw, lo[:, None], axis=-1)
    v_hi = jnp.take_along_axis(sw, hi[:, None], axis=-1)
    thresh = v_lo * (1 - frac) + v_hi * frac
    return w >= thresh


def _order_stat_bisect(w: jax.Array, k: jax.Array, iters: int = 34
                       ) -> jax.Array:
    """Exact k-th smallest (0-indexed) of w (B, N) per row, without sorting.

    Bisect over the INT32 BIT PATTERN of the f32 values (sign-folded so the
    int order matches the float order — the radix-sort trick), counting
    `key <= mid` per row (elementwise compare+reduce — TPU's jnp.sort over
    (B, 1024) is the expensive op this avoids). Integer bisection is EXACT for
    any dynamic range: the earlier value-range bisection had resolution
    (max-min)/2^32 and silently mis-selected on softmax*exp-scale weights
    spanning many orders of magnitude."""
    wi = jax.lax.bitcast_convert_type(w.astype(jnp.float32), jnp.int32)
    # monotonic int key: identity for non-negative floats, bit-complement of
    # the magnitude for negatives (maps -0.0 -> -1, more-negative -> smaller)
    key = wi ^ jnp.where(wi < 0, jnp.int32(0x7FFFFFFF), jnp.int32(0))
    lo = jnp.min(key, axis=-1)
    hi = jnp.max(key, axis=-1)
    kk = k.astype(jnp.int32)

    def body(_, carry):
        lo, hi = carry
        # overflow-safe floor average of two int32s of arbitrary sign
        mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
        cnt = jnp.sum(key <= mid[..., None], axis=-1)
        go_up = cnt <= kk          # too few at or below mid: raise the floor
        return jnp.where(go_up, mid + 1, lo), jnp.where(go_up, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    # exact element: the largest value still within the bracket's upper bound
    # (count(key <= hi) >= k+1 is invariant, so this is the k-th order stat)
    inside = key <= hi[..., None]
    return jnp.max(jnp.where(inside, w, -jnp.inf), axis=-1)


def quantile_mask_bisect(den_inv_std2d: jax.Array, quantile) -> jax.Array:
    """quantile_mask with the sort replaced by exact order-statistic bisection
    (same numpy/torch 'linear' interpolation semantics, bitwise-equal mask —
    pinned by tests incl. ties and wide-dynamic-range weights). The production
    select in solve_pnp_dense: `bench.py --mode stages` puts the whole
    decode+select stage at ~0.16 ms/batch (BASELINE.md stage budget)."""
    w = jnp.sum(den_inv_std2d, axis=-1)                       # (B, N)
    n = w.shape[-1]
    q = jnp.asarray(quantile, w.dtype)
    if q.ndim == 0:
        q = jnp.broadcast_to(q, w.shape[:1])
    pos = q * (n - 1)
    lo_r = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
    hi_r = jnp.clip(lo_r + 1, 0, n - 1)
    frac = pos - lo_r.astype(w.dtype)
    v_lo = _order_stat_bisect(w, lo_r)
    # the adjacent rank needs no second 34-iteration bisection: values <= v_lo
    # occupy sorted positions 0..cnt_le-1, so rank hi_r is either still inside
    # that block (v_hi = v_lo, duplicates) or the smallest value strictly
    # above it — two counting passes instead of another bisection.
    cnt_le = jnp.sum(w <= v_lo[..., None], axis=-1)
    next_up = jnp.min(jnp.where(w > v_lo[..., None], w, jnp.inf), axis=-1)
    v_hi = jnp.where((hi_r == lo_r) | (cnt_le > hi_r), v_lo, next_up)
    thresh = v_lo * (1 - frac) + v_hi * frac
    return w >= thresh[..., None]


def dense_grid_outputs(out: dict, gt: dict, *, bit_cnt, black_background: bool,
                       sample: int = 2):
    """Decode the dense head into flat correspondences (stride `sample`, top-left
    (0,0) as the reference uses at test time, test.py:93)."""
    nn_out = out.get('xyz_noc', out.get('xyz_noc_bin'))
    xyz = nn_out_to_xyz(nn_out, gt['noc_scale'], bit_cnt=bit_cnt,
                        model_transform=gt.get('model_transform'),
                        black_background=black_background, inference=True)

    wl = out['xyz_weight_logits']                             # (B, h, w, 2)
    B, h, w = wl.shape[:3]
    weights = jax.nn.softmax(wl.reshape(B, -1), axis=-1).reshape(wl.shape) \
        * out['xyz_weights_scale']
    seg = jax.nn.sigmoid(out['msk_vis_logits'][..., 0])

    sl = (slice(None), slice(0, None, sample), slice(0, None, sample))
    uv = jnp.broadcast_to(gen_uv((h, w))[None], (B, h, w, 2))[sl]
    hh, ww = uv.shape[1:3]
    n = hh * ww
    return dict(
        pts2d=uv.reshape(B, n, 2),
        pts3d=xyz[sl].reshape(B, n, 3),
        inv_std2d=weights[sl].reshape(B, n, 2),
        seg_prob=seg[sl].reshape(B, n),
    )


@functools.partial(jax.jit, static_argnames=(
    'bit_cnt', 'black_background', 'sample', 'point_select', 'solvers',
    'seg_thresh', 'quantile', 'max_iter'))
def solve_pnp_dense(out: dict, gt: dict, key: jax.Array, *, bit_cnt=None,
                    black_background=False, sample: int = 2,
                    point_select: str = 'quantile', quantile: float = 0.3,
                    seg_thresh: float = 0.5, solvers=('weighted',),
                    reproj_err=None, max_iter: int = 50) -> dict:
    """Returns {solver_name: pose7 (B, 7)} (reference test.py:68-136)."""
    d = dense_grid_outputs(out, gt, bit_cnt=bit_cnt,
                           black_background=black_background, sample=sample)
    pts2d, pts3d, inv_std = d['pts2d'], d['pts3d'], d['inv_std2d']
    inv_cov2d = inv_std ** 2
    seg_valid = d['seg_prob'] > seg_thresh

    if point_select == 'mask':
        valid = seg_valid
    elif point_select == 'quantile':
        # bisection variant: bit-identical mask to the sort form (tests pin
        # equality incl. ties), no TPU sort on the hot path
        valid = quantile_mask_bisect(inv_std, quantile)
    elif point_select == 'quantile_in_mask':
        vis_ratio = jnp.mean(seg_valid.astype(jnp.float32), axis=-1)
        q = 1.0 - (1.0 - quantile) * vis_ratio
        valid = quantile_mask_bisect(
            inv_std * seg_valid[..., None].astype(inv_std.dtype),
                              q) & seg_valid
    else:
        raise ValueError(point_select)

    thr = 3.0 if reproj_err is None else reproj_err
    rr = ransac_pnp(gt['out_K'], pts3d, pts2d, key, valid=valid,
                    reproj_threshold=thr)

    results = {}
    if 'ransac' in solvers:
        results['ransac'] = rr.pose7
    if 'weighted' in solvers:
        lm = lm_refine(rr.pose7, gt['out_K'], pts3d, pts2d, inv_cov2d,
                       valid=valid, max_iter=max_iter)
        results['weighted'] = lm.pose7
    if 'weighted_filtered' in solvers:
        lmf = lm_refine(rr.pose7, gt['out_K'], pts3d, pts2d, inv_cov2d,
                        valid=valid & rr.inliers, max_iter=max_iter)
        results['weighted-filtered'] = lmf.pose7
    return results


@functools.partial(jax.jit, static_argnames=('solvers', 'max_iter'))
def solve_pnp_sparse(out: dict, gt: dict, key: jax.Array, *,
                     solvers=('ransac', 'weighted'), reproj_err=None,
                     max_iter: int = 50) -> dict:
    """Sparse-keypoint path (reference test.py:48-64)."""
    pts2d, pts2d_std = out['pts2d'], out['pts2d_std']
    inv_cov2d = 1.0 / (pts2d_std ** 2)
    thr = 2.0 if reproj_err is None else reproj_err
    rr = ransac_pnp(gt['out_K'], gt['pts3d'], pts2d, key, reproj_threshold=thr)
    results = {}
    if 'ransac' in solvers:
        results['ransac'] = rr.pose7
    if 'weighted' in solvers:
        lm = lm_refine(rr.pose7, gt['out_K'], gt['pts3d'], pts2d, inv_cov2d,
                       max_iter=max_iter)
        results['weighted'] = lm.pose7
    return results
