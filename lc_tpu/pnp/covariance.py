"""Differentiable weighted-PnP covariance machinery, in closed form.

The reference builds these quantities with a tower of autodiff tricks: per-point
Hessians via functorch.jacfwd (reference lib/nll/pnp_auto.py:59-83), a custom
autograd Function whose backward is −cholesky_solve (the implicit-function-theorem
step, lib/nll/pnp_utils.py:118-129), and a vmapped autograd.grad over eye(6) to
materialize the jacobian (lib/nll/pnp_auto.py:129-134).

On TPU we exploit that all of it is evaluated *at the GT operating point with
pts2d = the GT projections*, where the residual is identically zero, so:

    H      = Σ_{n,c} w_{nc} · J_{nc} J_{nc}ᵀ          (the r·∂²r Newton term vanishes)
    cov    = H⁻¹                                       (prior 6×6 pose covariance)
    ∂update/∂pts2d = H⁻¹ (w ⊙ J)                       (since ∂(Jᵀ W r)/∂pts2d = −W J
                                                        and ∂update/∂(JᵀWr) = −H⁻¹)

Three batched einsums and one Cholesky — no grad-of-grad, fully differentiable wrt
the weights (gradients flow through H and wJ via standard cho_solve/cholesky rules),
which is exactly the create_graph=True behaviour the reference needs for the LC loss.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.smallmat import outer_accum_6
from .residual import residual_with_jac6d


def safe_cholesky(spd: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Cholesky with identity fallback: returns (L, invalid).

    Non-SPD inputs (detected by NaNs in the factor, evaluated on a detached copy so
    the validity test never enters the gradient) are replaced by I and flagged —
    mirrors reference lib/nll/pnp_utils.py:141-167 (make_sure_SPD / safe_cholesky).
    """
    from ..ops.smallmat import chol_factor_small
    _, ok = chol_factor_small(jax.lax.stop_gradient(spd))
    invalid = jnp.logical_not(ok)
    eye = jnp.eye(spd.shape[-1], dtype=spd.dtype)
    fixed = jnp.where(invalid[..., None, None], eye, spd)
    L, _ = chol_factor_small(fixed)
    return L, invalid


class PnPJacCov(NamedTuple):
    invalid: jax.Array      # (...,) bool — non-SPD normal equations
    jac: jax.Array          # (..., 6, N, 2) ∂update/∂pts2d
    cov: jax.Array          # (..., 6, 6) prior pose covariance H⁻¹
    hess_L: jax.Array       # (..., 6, 6) Cholesky factor of H


def weighted_pnp_jac_cov(pose_gt: jax.Array, cam_K: jax.Array, pts3d: jax.Array,
                         pts2d: jax.Array, weights: jax.Array,
                         valid: jax.Array | None = None) -> PnPJacCov:
    """Jacobian of the GN pose update wrt the 2D points, and the prior covariance.

    pose_gt: (..., 7); cam_K: (..., 3, 3); pts3d: (..., N, 3); pts2d: (..., N, 2)
    (the GT projections — the operating point is the optimum); weights: (..., N, 2)
    per-coordinate inverse variances (differentiable — this is the loss's main grad
    path); valid: (..., N) optional mask for padded points.

    Matches reference weighted_pnp_jac_wrt_pts2d + diff_pnp_perturb
    (lib/nll/pnp_auto.py:86-135) evaluated at r = 0.
    """
    _, J = residual_with_jac6d(pose_gt, cam_K, pts3d, pts2d)   # (..., N, 2, 6)
    w = weights
    if valid is not None:
        w = w * valid[..., None].astype(w.dtype)

    H = outer_accum_6(J, w)
    H = 0.5 * (H + jnp.swapaxes(H, -1, -2))
    L, invalid = safe_cholesky(H)
    eye = jnp.eye(6, dtype=H.dtype)
    H_fixed = jnp.where(invalid[..., None, None], eye, H)

    from ..ops.smallmat import chol_solve_small_mat
    wJ = w[..., None] * J                                       # (..., N, 2, 6)
    batch = wJ.shape[:-3]
    N = wJ.shape[-3]
    rhs = jnp.swapaxes(wJ.reshape(batch + (N * 2, 6)), -1, -2)  # (..., 6, 2N)
    sol, _ = chol_solve_small_mat(H_fixed, rhs)                 # (..., 6, 2N)
    jac = sol.reshape(batch + (6, N, 2))

    cov, _ = chol_solve_small_mat(
        H_fixed, jnp.broadcast_to(eye, H_fixed.shape))
    return PnPJacCov(invalid=invalid, jac=jac, cov=cov, hess_L=L)


@jax.custom_vjp
def pnp_update(hess_L: jax.Array, jtr: jax.Array) -> jax.Array:
    """Implicit GN update: forward is zeros (operating point is the optimum);
    backward routes cotangents through −H⁻¹ (implicit function theorem).

    API-parity port of reference _nll_update (lib/nll/pnp_utils.py:118-129); the LC
    loss itself uses the closed form above instead.
    """
    return jnp.zeros(hess_L.shape[:-2] + (6,), hess_L.dtype)


def _pnp_update_fwd(hess_L, jtr):
    return pnp_update(hess_L, jtr), hess_L


def _pnp_update_bwd(hess_L, g):
    vjp_jtr = -jax.scipy.linalg.cho_solve((hess_L, True), g[..., None])
    return jnp.zeros_like(hess_L), vjp_jtr


pnp_update.defvjp(_pnp_update_fwd, _pnp_update_bwd)
