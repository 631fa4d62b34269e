"""On-the-fly GT synthesis: symmetry-aware best-pose selection and dense targets.

Reference: losses.py:17-139 (nn_out_to_xyz, xyz_to_nn_target, selete_best_pose,
annots_on_the_fly). TPU-native differences:
  * symmetry candidates arrive padded to a fixed K with a validity mask (see
    geom.symmetry.pad_candidates) instead of ragged per-count chunks, so the whole
    batch is one vmapped selection — no host-side chunk bookkeeping;
  * everything is channel-last; bit counts are static config.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .. import codec
from ..geom.pose import RT_to_pose7
from ..geom.projection import xyz_from_homo_z
from ..geom.symmetry import select_pose_2d, select_pose_3d


def nn_out_to_xyz(nn_out: jax.Array, noc_scale_xfd: jax.Array, *,
                  raw_bits_gt: jax.Array | None = None,
                  noc_mask: jax.Array | None = None,
                  model_transform: jax.Array | None = None,
                  bit_cnt: Sequence[int] | None = None,
                  black_background: bool = False,
                  inference: bool = False) -> jax.Array:
    """Decode network output channels into model-frame XYZ.

    nn_out: (B, ..., C) channel-last (C = 3 for continuous NOC, sum(bit_cnt) for
    binary). noc_scale_xfd: (B, 3). model_transform: (B, 4, 4) canonical-frame
    transform or None. Returns (B, ..., 3).
    """
    def bshape(x):  # (B, 3) -> (B, 1, ..., 1, 3)
        return x.reshape(x.shape[:1] + (1,) * (nn_out.ndim - 2) + x.shape[1:])

    if bit_cnt is None:
        assert model_transform is None, \
            "model transform not supported for continuous xyz output (matches reference)"
        return nn_out * bshape(noc_scale_xfd)

    if inference:
        noc = codec.logits_to_noc(nn_out, bit_cnt, black_background)
    else:
        noc = codec.logits_to_noc_with_gt(nn_out, raw_bits_gt, bit_cnt, noc_mask,
                                          black_background)
    xyz_xfd = noc * bshape(noc_scale_xfd)
    if model_transform is not None:
        t = bshape(model_transform[:, :3, 3])
        R = model_transform[:, :3, :3]
        R = R.reshape(R.shape[:1] + (1,) * (nn_out.ndim - 3) + (3, 3))
        xyz = (xyz_xfd - t) @ R  # rows: (x_xfd - t)ᵀ R = (Rᵀ(x_xfd - t))ᵀ... see note
        # model_transform maps model->xfd frame: x_xfd = R x + t, so x = Rᵀ(x_xfd - t);
        # row-vector form: (x_xfd - t) @ R gives Rᵀ applied — matches reference
        # losses.py:44 ((xyz_xformed - t) @ M[:3,:3]).
        return xyz
    return xyz_xfd


def xyz_to_nn_target(xyz: jax.Array, noc_scale_xfd: jax.Array, *,
                     noc_mask: jax.Array | None = None,
                     model_transform: jax.Array | None = None,
                     bit_cnt: Sequence[int] | None = None,
                     black_background: bool = False):
    """GT XYZ (B, H, W, 3) -> (target, raw_bits | None), target channel-last.

    Reference losses.py:48-65.
    """
    xyz = jax.lax.stop_gradient(xyz)
    if model_transform is not None:
        R = model_transform[:, None, :3, :3]                  # (B, 1, 3, 3)
        t = model_transform[:, None, None, :3, 3]             # (B, 1, 1, 3)
        xfd = xyz @ jnp.swapaxes(R, -1, -2) + t
        if noc_mask is not None:
            xfd = xfd * noc_mask[..., None]
    else:
        xfd = xyz
    noc = xfd / noc_scale_xfd[:, None, None, :]

    if bit_cnt is None:
        assert model_transform is None
        return noc, None
    target, raw_bits = codec.noc_to_nn_target(noc, bit_cnt, black_background)
    return target, raw_bits


def select_best_pose(gt: dict, out: dict, *, sym_aware_started: bool,
                     bit_cnt: Sequence[int] | None,
                     black_background: bool = False):
    """Pick the best symmetry candidate per sample and build GT XYZ.

    gt keys: Rt_candi (B, K, 3, 4) padded, candi_valid (B, K) bool, homo_z_out
    (B, h, w, 3), R_no_aug/t_no_aug/K_no_aug, msk_noc (B, h, w), sym_ck_pts2d
    (B, S, 2) int, noc_scale (B, 3), out_K; optional model_transform, pts3d.
    Returns (Rt_best (B,3,4), pose_best (B,7), xyz_gt (B,h,w,3)).
    Reference losses.py:68-117.
    """
    candis = gt['Rt_candi']
    candi_valid = gt.get('candi_valid')
    B, K = candis.shape[:2]
    homo_z = gt['homo_z_out']
    h, w = homo_z.shape[1:3]
    K_no_aug = gt['K_no_aug']
    msk_noc = gt['msk_noc']

    if K == 1 or not sym_aware_started:
        Rt_best = candis[:, 0]
    elif 'pts2d' in out:  # sparse path: best by 2D reprojection of FPS keypoints
        Rt_best = select_pose_2d(gt['out_K'], gt['pts3d'], out['pts2d'],
                                 candis, candi_valid)
    else:  # dense path: best by 3D backprojection error at check points
        pts2d = jnp.maximum(gt['sym_ck_pts2d'], 0)            # (B, S, 2) clamp -1 pads
        xg = pts2d[..., 0]
        yg = pts2d[..., 1]
        bidx = jnp.arange(B)[:, None]

        if 'xyz_noc' in out:
            nn_samples = out['xyz_noc'][bidx, yg, xg]          # (B, S, 3)
        else:
            nn_samples = out['xyz_noc_bin'][bidx, yg, xg]      # (B, S, C)
        ck_pts3d = nn_out_to_xyz(
            nn_samples, gt['noc_scale'], bit_cnt=bit_cnt,
            model_transform=gt.get('model_transform'),
            black_background=black_background, inference=True)
        homo_samples = homo_z[bidx, yg, xg]                    # (B, S, 3)
        Rt_best = select_pose_3d(K_no_aug, ck_pts3d, homo_samples,
                                 candis, candi_valid)

    pose_best = RT_to_pose7(Rt_best[..., :3], Rt_best[..., 3])
    xyz_flat = xyz_from_homo_z(homo_z.reshape(B, h * w, 3),
                               Rt_best[..., :3], Rt_best[..., 3], K_no_aug)
    xyz_gt = xyz_flat.reshape(B, h, w, 3) * msk_noc[..., None]
    return Rt_best, pose_best, xyz_gt


def annots_on_the_fly(gt: dict, out: dict, *, step, sym_aware_start: int = 0,
                      bit_cnt: Sequence[int] | None = None,
                      black_background: bool = False) -> dict:
    """Synthesize training targets for the current predictions (no grad).

    Returns a dict of new annotations to merge into gt (reference losses.py:120-139).
    `step` may be a traced int; sym gating uses jnp.where-compatible select inside
    select_best_pose via a boolean operand only when K > 1 statically.
    """
    out_sg = {k: jax.lax.stop_gradient(v) for k, v in out.items()}
    K = gt['Rt_candi'].shape[1]
    if K == 1:
        sym_started = False
    else:
        # steps are python ints at trace time in the reference; here `step` may be
        # traced — resolve with a concrete bool if possible, else select both paths.
        if isinstance(step, (int, float)):
            sym_started = step >= sym_aware_start
        else:
            sym_started = True  # compute sym-aware; blend below
    Rt_best, pose_best, xyz_gt = select_best_pose(
        gt, out_sg, sym_aware_started=sym_started, bit_cnt=bit_cnt,
        black_background=black_background)
    if K > 1 and not isinstance(step, (int, float)):
        Rt0 = gt['Rt_candi'][:, 0]
        pose0 = RT_to_pose7(Rt0[..., :3], Rt0[..., 3])
        B = Rt0.shape[0]
        h, w = gt['homo_z_out'].shape[1:3]
        xyz0 = xyz_from_homo_z(gt['homo_z_out'].reshape(B, h * w, 3),
                               Rt0[..., :3], Rt0[..., 3], gt['K_no_aug'])
        xyz0 = xyz0.reshape(B, h, w, 3) * gt['msk_noc'][..., None]
        use_sym = step >= sym_aware_start
        Rt_best = jnp.where(use_sym, Rt_best, Rt0)
        pose_best = jnp.where(use_sym, pose_best, pose0)
        xyz_gt = jnp.where(use_sym, xyz_gt, xyz0)

    target, raw_bits = xyz_to_nn_target(
        xyz_gt, gt['noc_scale'], noc_mask=gt['msk_noc'],
        model_transform=gt.get('model_transform'), bit_cnt=bit_cnt,
        black_background=black_background)

    annot = dict(Rt_best=Rt_best, pose_best=pose_best, xyz_gt=xyz_gt)
    if raw_bits is None:
        annot['xyz_noc_tgt'] = target
    else:
        annot['xyz_noc_bin_tgt'] = target
        annot['xyz_noc_bin_raw'] = raw_bits
    return jax.tree.map(jax.lax.stop_gradient, annot)
