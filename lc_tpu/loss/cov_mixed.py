"""The Linear-Covariance loss (the paper's core), TPU-native.

Semantics match reference lib/cov_mixed.py:100-150 (Loss_cov_mixed) with the
covariance machinery replaced by the closed forms in lc_tpu.pnp.covariance:

    loss = log(prior_err) + 0.5 · (cov_err + linear_err) / prior_err

where prior_err is the bbox-propagated size of the prior pose covariance
(JᵀWJ)⁻¹, cov_err propagates the *estimated* 2D error covariance through the
pose-update jacobian, and linear_err is the linearized pose error induced by the
actual (clamped, detached) residuals. All three are differentiable functions of
the per-pixel confidence weights — the gradient path that teaches the network
which correspondences to trust.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geom.pose import pose7_to_RT, apply_perturb
from ..geom.projection import project_apply
from ..pnp.covariance import weighted_pnp_jac_cov


def twice_huber(val_abs: jax.Array, delta) -> jax.Array:
    """x² below delta, linear (slope 2·delta) above — reference cov_mixed.py:10."""
    delta = jax.lax.stop_gradient(delta) if isinstance(delta, jax.Array) else delta
    return jnp.where(val_abs > delta, delta * (2.0 * val_abs - delta), val_abs ** 2)


def clamp_error(error: jax.Array, max_err_len) -> jax.Array:
    """Shrink 2D error vectors longer than max_err_len back to that length.

    The shrink amount is detached so gradients see a pure translation
    (reference cov_mixed.py:16-24).
    """
    if isinstance(max_err_len, jax.Array):
        max_err_len = max_err_len[..., None]
    err_len = jnp.linalg.norm(error, axis=-1) + 1e-6
    f = ((err_len - max_err_len) / err_len)[..., None]
    delta = jax.lax.stop_gradient(jnp.where(f > 0, f * error, 0.0))
    return error - delta


def robust_weights_cov(inv_std2d_pred: jax.Array, error2d: jax.Array,
                       valid_mask: jax.Array | None,
                       rel_thresh: float = 3.0, w_e_thresh: float = 4.0
                       ) -> tuple[jax.Array, jax.Array]:
    """Robust (twice-Huber) weights and per-point error-covariance estimate.

    inv_std2d_pred, error2d: (..., N, 2); valid_mask: (..., N) or None.
    Returns (weights, cov_est), both (..., N, 2) — reference cov_mixed.py:27-39.
    """
    error = jnp.abs(error2d)
    if valid_mask is not None:
        vm = valid_mask[..., None]
        vcnt = jnp.sum(valid_mask, axis=-1, keepdims=True)[..., None]
        mean_abs = jnp.sum(error * vm, axis=-2, keepdims=True) / vcnt
    else:
        mean_abs = jnp.mean(error, axis=-2, keepdims=True)
    mean_abs = jax.lax.stop_gradient(mean_abs)
    cov = twice_huber(error, mean_abs * rel_thresh)

    w_e = jax.lax.stop_gradient((inv_std2d_pred ** 2) * cov)
    if valid_mask is not None:
        mean_w_e = jnp.sum(w_e * vm, axis=-2, keepdims=True) / vcnt
    else:
        mean_w_e = jnp.mean(w_e, axis=-2, keepdims=True)
    delta_inv_std = jnp.sqrt(
        (mean_w_e * w_e_thresh) / (jax.lax.stop_gradient(cov) + 1e-6))
    weights = twice_huber(inv_std2d_pred, delta_inv_std)
    return weights, cov


def xform_3d(state: jax.Array, bbox3d: jax.Array) -> jax.Array:
    """Pose -> flattened world coords of the 8 bbox corners (..., 24)."""
    R, t = pose7_to_RT(state)
    pts = bbox3d @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    return pts.reshape(pts.shape[:-2] + (-1,))


def xform_2d(state: jax.Array, cam_K: jax.Array, bbox3d: jax.Array) -> jax.Array:
    """Pose -> flattened 2D projections of the 8 bbox corners (..., 16)."""
    R, t = pose7_to_RT(state)
    uv = project_apply(cam_K, bbox3d, R, t)
    return uv.reshape(uv.shape[:-2] + (-1,))


def jac_update_to_alter(state: jax.Array, xform_fn) -> jax.Array:
    """Jacobian of xform(apply_perturb(state, δ)) at δ = 0: (..., D, 6).

    One tiny jacfwd over the 6-dim perturbation — the natural JAX form of reference
    jac_update2alter (cov_mixed.py:42-65, which offers exactly this jacfwd variant).
    """
    state = jax.lax.stop_gradient(state)

    def per_item(st):
        return jax.jacfwd(lambda d: xform_fn(apply_perturb(st, d)))(
            jnp.zeros(6, st.dtype))

    for _ in range(state.ndim - 1):
        per_item = jax.vmap(per_item)
    return per_item(state)


def transformed_cov_from_jac(update_cov: jax.Array, jac: jax.Array) -> jax.Array:
    """diag(J C Jᵀ) per output dim: (..., D) from C (..., 6, 6), J (..., D, 6)."""
    return jnp.sum((jac @ update_cov) * jac, axis=-1)


def _loss_cov_nd(cov_diag: jax.Array, nd: int) -> jax.Array:
    """Mean per-corner std from a per-dim transformed covariance diagonal.

    cov_diag: (B, 8*nd). Any non-positive diagonal (numerical failure) collapses the
    whole sample to 1 — reference cov_mixed.py:83-97.
    """
    B = cov_diag.shape[0]
    good = jnp.all(cov_diag > 0, axis=-1, keepdims=True)
    per_pt = jnp.where(good, jnp.sum(cov_diag.reshape(B, -1, nd), axis=-1), 1.0)
    return jnp.mean(jnp.sqrt(per_pt), axis=-1)


def loss_cov_mixed(K_out: jax.Array, pose_gt: jax.Array, pts3d: jax.Array,
                   pts2d_out: jax.Array, inv_std2d: jax.Array,
                   valid_factor: jax.Array | None, *, bbox_3d: jax.Array,
                   max_err_len: float = 32.0, rel_thresh: float = 3.0,
                   w_e_thresh: float = 4.0, cov_2d: bool = False) -> jax.Array:
    """Per-sample LC loss (B,). All shapes batched with leading B.

    K_out: (B, 3, 3) crop-space camera; pose_gt: (B, 7); pts3d: (B, N, 3) predicted
    3D correspondences; pts2d_out: (B, N, 2) their pixel locations; inv_std2d:
    (B, N, 2) predicted inverse stds; valid_factor: (B, N) mask or None;
    bbox_3d: (B, 8, 3) model bbox corners.
    """
    R, t = pose7_to_RT(pose_gt)
    pts2d_proj = project_apply(K_out, pts3d, R, t)
    err_2d = pts2d_out - pts2d_proj
    error_clamped = clamp_error(err_2d, max_err_len)
    weights, cov_est = robust_weights_cov(inv_std2d, error_clamped, valid_factor,
                                          rel_thresh=rel_thresh,
                                          w_e_thresh=w_e_thresh)

    pjc = weighted_pnp_jac_cov(
        jax.lax.stop_gradient(pose_gt), jax.lax.stop_gradient(K_out),
        jax.lax.stop_gradient(pts3d), jax.lax.stop_gradient(pts2d_proj),
        weights, valid=valid_factor)

    B, N = pts2d_out.shape[:2]
    jac_d = pjc.jac.reshape(B, 6, 2 * N)                      # (B, 6, 2N)

    if cov_2d:
        # jac_update_to_alter vmaps over the batch dim of `state` only; close over
        # per-sample K/bbox by vmapping the whole thing explicitly.
        jac_a = jax.vmap(
            lambda st, k, bb: jax.jacfwd(
                lambda d: xform_2d(apply_perturb(jax.lax.stop_gradient(st), d), k, bb)
            )(jnp.zeros(6, st.dtype))
        )(pose_gt, K_out, bbox_3d)                            # (B, 16, 6)
        err_dim = 2
    else:
        jac_a = jax.vmap(
            lambda st, bb: jax.jacfwd(
                lambda d: xform_3d(apply_perturb(jax.lax.stop_gradient(st), d), bb)
            )(jnp.zeros(6, st.dtype))
        )(pose_gt, bbox_3d)                                   # (B, 24, 6)
        err_dim = 3

    prior_alter = transformed_cov_from_jac(pjc.cov, jac_a)    # (B, 24)
    prior_err = _loss_cov_nd(prior_alter, err_dim)            # (B,)

    cov_flat = cov_est.reshape(B, 2 * N)
    half = (jac_d * cov_flat[:, None, :]) @ jnp.swapaxes(jac_d, -1, -2) * 0.5
    update_cov = half + jnp.swapaxes(half, -1, -2)
    alter_cov = transformed_cov_from_jac(update_cov, jac_a)
    cov_err = _loss_cov_nd(alter_cov, err_dim)

    err_flat = jax.lax.stop_gradient(error_clamped).reshape(B, 2 * N, 1)
    delta = (jac_a @ (jac_d @ err_flat))[..., 0]              # (B, 24)
    linear_err = jnp.mean(
        jnp.linalg.norm(delta.reshape(B, 8, err_dim), axis=-1), axis=-1)

    return jnp.log(prior_err) + 0.5 * (cov_err + linear_err) / prior_err
