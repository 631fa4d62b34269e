"""Loss orchestration: surrogate + LC pose losses with ramp gating and grad taps.

Reference losses.py:239-386 (Loss_fn). Functional: all mutable pieces (binary-code
histogram EMA, adaptive grad-clip thresholds) live in an explicit LossState; the
observed activation-gradient norms come back through grad_tap dummies (see clip.py).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .clip import ClipperState, grad_tap, clip_threshold, update_clipper_state, \
    init_clipper_state
from .cov_mixed import loss_cov_mixed
from .surrogate import xyz_bin_loss, init_bin_histogram, seg_bce_loss, seg_l1_loss, \
    sparse_kpt_nll_loss
from .targets import nn_out_to_xyz
from ..geom.pose import pose7_to_RT
from ..geom.projection import project_apply, gen_uv


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static loss hyperparameters (from cfg.loss + globals; see configs/*.yaml)."""
    w_loss_noc: float = 0.0
    w_loss_noc_bin: float = 0.0
    w_loss_seg: float = 0.0
    w_loss_pose: float = 0.0
    w_loss_kpts: float = 0.0
    seg_loss_type: str = "bce"           # 'bce' | 'l1'
    full_pose_loss_step: int = 0         # max(start_step, start_epoch*steps_per_epoch)
    loss_pose_nz_step: int = 0
    dense_sample: int = 2
    max_err_len: float = 32.0
    cov_2d: bool = False                 # propagate to projected-bbox (2D) corners
    clip_weight_grad: bool = True
    clip_scale_grad: bool = False
    clip_pts_grad: bool = False
    bit_cnt: tuple | None = None
    black_background: bool = False
    sparse: bool = False


class LossState(NamedTuple):
    histogram: jax.Array | None
    weight_clip: ClipperState
    scale_clip: ClipperState
    pts_clip: ClipperState


def init_loss_state(cfg: LossConfig) -> LossState:
    hist = init_bin_histogram(sum(cfg.bit_cnt)) if cfg.bit_cnt else None
    return LossState(histogram=hist,
                     weight_clip=init_clipper_state(),
                     scale_clip=init_clipper_state(),
                     pts_clip=init_clipper_state())


def zero_taps() -> dict:
    return {k: jnp.zeros(()) for k in ("weight", "scale", "pts")}


def _strided_grid(x: jax.Array, sample: int, top, left):
    """x (B, H, W, C) -> (B, h·w, C) taking rows top::sample, cols left::sample with a
    fixed count floor(H/sample) (the reference's ragged slice length varies by ±1 with
    the random offset; we keep the floor so shapes stay static)."""
    B, H, W = x.shape[:3]
    h, w = H // sample, W // sample
    rows = top + sample * jnp.arange(h)
    cols = left + sample * jnp.arange(w)
    sub = x[:, rows][:, :, cols]
    return sub.reshape(B, h * w, *x.shape[3:])


def _pose_ramp(cfg: LossConfig, step) -> jax.Array:
    denom = max(cfg.full_pose_loss_step - cfg.loss_pose_nz_step, 0) + 1e-5
    f = (step - cfg.loss_pose_nz_step + 1) / denom
    return jnp.clip(f, 0.0, 1.0)


def compute_losses(cfg: LossConfig, gt: dict, out: dict, state: LossState,
                   step, taps: dict, sample_top_left=(0, 0)):
    """Returns (total_loss, loss_dict, new_state).

    `taps` are the zero dummies whose gradients report observed activation-grad norms
    (differentiate wrt them alongside params and feed finalize_loss_state).
    """
    loss_dict: dict[str, jax.Array] = {}
    new_hist = state.histogram

    if cfg.sparse:
        pts2d, pts2d_std = out['pts2d'], out['pts2d_std']
        pose_best, K, pts3d = gt['pose_best'], gt['out_K'], gt['pts3d']
        proj = project_apply(K, pts3d, *pose7_to_RT(pose_best))
        loss_kpts = sparse_kpt_nll_loss(pts2d, pts2d_std, proj)
        loss_dict['loss_kpts'] = loss_kpts
        if cfg.w_loss_pose > 0:
            lc = loss_cov_mixed(K, pose_best, pts3d, pts2d, 1.0 / pts2d_std, None,
                                bbox_3d=gt['bbox_3d'], cov_2d=cfg.cov_2d)
            f = _pose_ramp(cfg, step)
            loss_dict['loss_pose'] = f * jnp.mean(lc) + (1.0 - f) * loss_kpts
    else:
        msk_noc = gt['msk_noc']                       # (B, h, w)
        msk_vis = gt['msk_vis']                       # (B, h, w)
        has_bin = cfg.bit_cnt is not None

        if not has_bin:
            noc_msked = out['xyz_noc'] * msk_noc[..., None]
            loss_dict['loss_noc'] = jnp.mean(
                jnp.abs(noc_msked - gt['xyz_noc_tgt']))
        else:
            loss_bin, new_hist = xyz_bin_loss(
                out['xyz_noc_bin'], gt['xyz_noc_bin_tgt'],
                out['msk_vis_logits'], state.histogram)
            loss_dict['loss_noc_bin'] = loss_bin

        seg_fn = seg_l1_loss if cfg.seg_loss_type.lower() == 'l1' else \
            (lambda lg, tg: seg_bce_loss(lg, tg))
        loss_dict['loss_seg'] = seg_fn(out['msk_vis_logits'], msk_vis[..., None])

        # --- dense LC pose loss ---
        weight_logits = out['xyz_weight_logits']      # (B, h, w, 2)
        if cfg.clip_weight_grad:
            weight_logits = grad_tap(weight_logits, clip_threshold(state.weight_clip),
                                     taps['weight'])
        scale = out['xyz_weights_scale']              # (B, 1, 1, 1)
        if cfg.clip_scale_grad:
            scale = grad_tap(scale, clip_threshold(state.scale_clip), taps['scale'])

        B, h, w = weight_logits.shape[:3]
        wl_flat = weight_logits.reshape(B, -1)
        weights_full = jax.nn.softmax(wl_flat, axis=-1).reshape(
            weight_logits.shape) * scale              # (B, h, w, 2)

        top, left = sample_top_left
        s = cfg.dense_sample
        den_pts2d = _strided_grid(
            jnp.broadcast_to(gen_uv((h, w))[None], (B, h, w, 2)), s, top, left)
        den_inv_std2d = _strided_grid(weights_full, s, top, left)

        if not has_bin:
            den_pts3d = _strided_grid(out['xyz_noc'], s, top, left) \
                * gt['noc_scale'][:, None, :]
        else:
            logits_sub = _strided_grid(out['xyz_noc_bin'], s, top, left)
            raw_sub = _strided_grid(gt['xyz_noc_bin_raw'].astype(bool), s, top, left)
            msk_vis_pred = out['msk_vis_logits'][..., 0] > 0
            vis_sub = _strided_grid(msk_vis_pred[..., None], s, top, left)[..., 0]
            noc_sub = _strided_grid(msk_noc[..., None], s, top, left)[..., 0] > 0.5
            den_pts3d = nn_out_to_xyz(
                logits_sub, gt['noc_scale'], raw_bits_gt=raw_sub, noc_mask=noc_sub,
                model_transform=gt.get('model_transform'), bit_cnt=cfg.bit_cnt,
                black_background=cfg.black_background)
            del vis_sub  # reference computes msk_vis but uses noc mask in decode

        if cfg.clip_pts_grad:
            den_pts3d = grad_tap(den_pts3d, clip_threshold(state.pts_clip),
                                 taps['pts'])

        den_valid = jnp.ones_like(den_pts3d[..., 0])
        lc = loss_cov_mixed(gt['out_K'], gt['pose_best'], den_pts3d, den_pts2d,
                            den_inv_std2d, den_valid, bbox_3d=gt['bbox_3d'],
                            max_err_len=cfg.max_err_len, cov_2d=cfg.cov_2d)
        loss_pose = jnp.mean(lc)

        f = _pose_ramp(cfg, step)
        msk_vis_tgt = jnp.broadcast_to(msk_vis[..., None], weight_logits.shape)
        loss_weight_seg = seg_fn(weight_logits, msk_vis_tgt)
        loss_dict['loss_pose'] = f * loss_pose + (1.0 - f) * loss_weight_seg

    weights_cfg = {
        'loss_noc': cfg.w_loss_noc, 'loss_noc_bin': cfg.w_loss_noc_bin,
        'loss_seg': cfg.w_loss_seg, 'loss_pose': cfg.w_loss_pose,
        'loss_kpts': cfg.w_loss_kpts,
    }
    total = sum(v * weights_cfg[k] for k, v in loss_dict.items()
                if weights_cfg.get(k, 0) > 0)
    new_state = LossState(histogram=new_hist, weight_clip=state.weight_clip,
                          scale_clip=state.scale_clip, pts_clip=state.pts_clip)
    return total, loss_dict, new_state


def finalize_loss_state(state: LossState, tap_grads: dict, cfg: LossConfig
                        ) -> LossState:
    """Fold the observed activation-gradient norms into the EMA clip thresholds."""
    ws = update_clipper_state(state.weight_clip, tap_grads['weight']) \
        if cfg.clip_weight_grad else state.weight_clip
    sc = update_clipper_state(state.scale_clip, tap_grads['scale'],
                              rel_thresh=2.0) if cfg.clip_scale_grad \
        else state.scale_clip
    pt = update_clipper_state(state.pts_clip, tap_grads['pts'], rel_thresh=2.0) \
        if cfg.clip_pts_grad else state.pts_clip
    return LossState(histogram=state.histogram, weight_clip=ws, scale_clip=sc,
                     pts_clip=pt)
