"""Fused Levenberg-Marquardt PnP refiner as a single Pallas kernel.

The BASELINE north-star names this op: the Ceres replacement as a Pallas kernel.
`lc_tpu/pnp/solver.py` already runs the batched LM as one XLA program; this kernel
goes further:

  * one grid program per problem — each problem iterates only until *its own*
    convergence (the XLA while_loop advances the whole batch in lockstep to the
    slowest problem);
  * the entire solve lives in VMEM: points, weights, jacobian rows, and the 6×6
    normal equations never round-trip to HBM between iterations;
  * the residual/jacobian assembly is expressed over (N,)-lane vectors with scalar
    FMA coefficients (MXU-free; the contraction dims are 2, 3 and 6), and the 6×6
    Cholesky solve is fully unrolled scalar code.

Inputs are padded so N is a lane multiple; masked points carry zero weight.
Semantics match solver.lm_refine (same trust-region policy and stopping rules);
tests compare the two directly.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom.rotations import quaternion_to_matrix, matrix_to_quaternion
from .solver import LMResult


def _lm_kernel(meta_ref, pose_ref, K_ref, X_ref, x2d_ref, w_ref,
               out_pose_ref, out_stat_ref, *, max_iter: int,
               function_tolerance: float, min_relative_decrease: float,
               initial_radius: float):
    """One problem per grid step. Per-problem blocks: X/x2d/w (1, ch, N) VMEM;
    the small per-problem scalars (meta (B, 8), pose (B, 8), K (B, 8)) and the
    outputs (pose (B, 8), stat (B, 8)) are full-array VMEM blocks indexed by
    program_id (Mosaic requires block trailing dims divisible by (8, 128) or
    equal to the array's — tiny per-row blocks are rejected)."""
    import jax.experimental.pallas as pl

    b = pl.program_id(0)
    N = X_ref.shape[2]
    X0 = X_ref[0, 0, :]
    X1 = X_ref[0, 1, :]
    X2 = X_ref[0, 2, :]
    u_obs = x2d_ref[0, 0, :]
    v_obs = x2d_ref[0, 1, :]
    wu = w_ref[0, 0, :]
    wv = w_ref[0, 1, :]

    fx = K_ref[b, 0]
    k01 = K_ref[b, 1]
    fy = K_ref[b, 2]
    cx = K_ref[b, 3]
    cy = K_ref[b, 4]
    n_valid = meta_ref[b, 0]

    # skew-cross basis rows: C_k = e_k × X
    C00, C01, C02 = jnp.zeros_like(X0), -X2, X1
    C10, C11, C12 = X2, jnp.zeros_like(X0), -X0
    C20, C21, C22 = -X1, X0, jnp.zeros_like(X0)

    def gn_terms(q, t):
        """Weighted cost, gradient (6,), upper-tri H (21,) at pose (q, t)."""
        # R from quaternion (scalars)
        w0, x0, y0, z0 = q[0], q[1], q[2], q[3]
        s = 2.0 / (w0 * w0 + x0 * x0 + y0 * y0 + z0 * z0)
        R00 = 1.0 - s * (y0 * y0 + z0 * z0)
        R01 = s * (x0 * y0 - w0 * z0)
        R02 = s * (x0 * z0 + w0 * y0)
        R10 = s * (x0 * y0 + w0 * z0)
        R11 = 1.0 - s * (x0 * x0 + z0 * z0)
        R12 = s * (y0 * z0 - w0 * x0)
        R20 = s * (x0 * z0 - w0 * y0)
        R21 = s * (y0 * z0 + w0 * x0)
        R22 = 1.0 - s * (x0 * x0 + y0 * y0)

        p0 = R00 * X0 + R01 * X1 + R02 * X2 + t[0]
        p1 = R10 * X0 + R11 * X1 + R12 * X2 + t[1]
        p2 = R20 * X0 + R21 * X1 + R22 * X2 + t[2]
        inv_z = 1.0 / jnp.maximum(p2, 1e-6)
        u0 = p0 * inv_z
        v0 = p1 * inv_z
        ru = fx * u0 + k01 * v0 + cx - u_obs
        rv = fy * v0 + cy - v_obs

        # D_k = R @ C_k (3 rows as lane vectors), k = 0..2 rotation columns
        def D(Ck0, Ck1, Ck2):
            return (R00 * Ck0 + R01 * Ck1 + R02 * Ck2,
                    R10 * Ck0 + R11 * Ck1 + R12 * Ck2,
                    R20 * Ck0 + R21 * Ck1 + R22 * Ck2)

        cols_u = []
        cols_v = []
        for (d0, d1, d2) in (D(C00, C01, C02), D(C10, C11, C12),
                             D(C20, C21, C22)):
            ju0 = inv_z * (d0 - u0 * d2)
            jv0 = inv_z * (d1 - v0 * d2)
            cols_u.append(fx * ju0 + k01 * jv0)
            cols_v.append(fy * jv0)
        # translation columns: dp/dt = I
        ju0 = inv_z
        jv0 = jnp.zeros_like(inv_z)
        cols_u.append(fx * ju0 + k01 * jv0)          # d/dtx
        cols_v.append(fy * jv0)
        ju0 = jnp.zeros_like(inv_z)
        jv0 = inv_z
        cols_u.append(fx * ju0 + k01 * jv0)          # d/dty
        cols_v.append(fy * jv0)
        ju0 = -u0 * inv_z
        jv0 = -v0 * inv_z
        cols_u.append(fx * ju0 + k01 * jv0)          # d/dtz
        cols_v.append(fy * jv0)

        cost = 0.5 * jnp.sum(wu * ru * ru + wv * rv * rv)
        g = jnp.stack([jnp.sum(wu * ru * cols_u[i] + wv * rv * cols_v[i])
                       for i in range(6)])
        h_entries = []
        for i in range(6):
            for j in range(i, 6):
                h_entries.append(jnp.sum(wu * cols_u[i] * cols_u[j]
                                         + wv * cols_v[i] * cols_v[j]))
        return cost, g, jnp.stack(h_entries)

    def chol_solve6(h_ut, g, mu):
        """Solve (H + mu·diag(H)) δ = −g with H from its 21 upper-tri entries.
        Returns (delta (6,), ok). Fully unrolled scalar Cholesky."""
        idx = {}
        k = 0
        for i in range(6):
            for j in range(i, 6):
                idx[(i, j)] = k
                k += 1
        A = [[h_ut[idx[(min(i, j), max(i, j))]] for j in range(6)]
             for i in range(6)]
        for i in range(6):
            d = jnp.clip(A[i][i], 1e-6, 1e32)
            A[i][i] = A[i][i] + mu * d
        L = [[jnp.zeros(()) for _ in range(6)] for _ in range(6)]
        ok = jnp.array(True)
        for j in range(6):
            acc = A[j][j]
            for p in range(j):
                acc = acc - L[j][p] * L[j][p]
            ok = jnp.logical_and(ok, acc > 0.0)
            Ljj = jnp.sqrt(jnp.maximum(acc, 1e-30))
            L[j][j] = Ljj
            for i in range(j + 1, 6):
                acc = A[i][j]
                for p in range(j):
                    acc = acc - L[i][p] * L[j][p]
                L[i][j] = acc / Ljj
        # forward/backward substitution for -g
        y = [jnp.zeros(())] * 6
        for i in range(6):
            acc = -g[i]
            for p in range(i):
                acc = acc - L[i][p] * y[p]
            y[i] = acc / L[i][i]
        d = [jnp.zeros(())] * 6
        for i in reversed(range(6)):
            acc = y[i]
            for p in range(i + 1, 6):
                acc = acc - L[p][i] * d[p]
            d[i] = acc / L[i][i]
        return jnp.stack(d), ok

    def apply_delta(q, t, delta):
        """Right perturbation: q' = q ⊗ quat(δrot), t' = t + δt (Taylor chart)."""
        aa0, aa1, aa2 = delta[0], delta[1], delta[2]
        sq = aa0 * aa0 + aa1 * aa1 + aa2 * aa2
        bw = 1.0 - sq / 8.0
        f = 0.5 - sq / 48.0
        bx, by, bz = aa0 * f, aa1 * f, aa2 * f
        aw, ax, ay, az = q[0], q[1], q[2], q[3]
        q_new = jnp.stack([
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ])
        t_new = jnp.stack([t[0] + delta[3], t[1] + delta[4], t[2] + delta[5]])
        return q_new, t_new

    q0 = jnp.stack([pose_ref[b, i] for i in range(4)])
    t0 = jnp.stack([pose_ref[b, 4 + i] for i in range(3)])
    cost0, _, _ = gn_terms(q0, t0)

    too_few = n_valid < 3.0

    def cond(c):
        it, done = c[0], c[1]
        return jnp.logical_and(it < max_iter, jnp.logical_not(done > 0.5))

    def body(c):
        (it, done, q, t, cost, radius, df) = c
        _, g, h_ut = gn_terms(q, t)
        delta, chol_ok = chol_solve6(h_ut, g, 1.0 / radius)
        q_new, t_new = apply_delta(q, t, delta)
        new_cost, _, _ = gn_terms(q_new, t_new)

        idx = {}
        k = 0
        for i in range(6):
            for j in range(i, 6):
                idx[(i, j)] = k
                k += 1
        Hd = [sum(h_ut[idx[(min(i, j), max(i, j))]] * delta[j]
                  for j in range(6)) for i in range(6)]
        model_dec = -(sum(g[i] * delta[i] for i in range(6))
                      + 0.5 * sum(delta[i] * Hd[i] for i in range(6)))
        rho = (cost - new_cost) / jnp.maximum(model_dec, 1e-30)
        accept = jnp.logical_and(chol_ok, jnp.logical_and(
            model_dec > 0, rho > min_relative_decrease))
        accept = jnp.logical_and(accept, jnp.isfinite(new_cost))

        shrink = 2.0 * rho - 1.0
        grow = jnp.maximum(1.0 / 3.0, 1.0 - shrink ** 3)
        radius_new = jnp.where(accept, radius / grow, radius / df)
        radius_new = jnp.clip(radius_new, 1e-32, 1e16)
        df_new = jnp.where(accept, 2.0, df * 2.0)

        converged = jnp.logical_and(
            accept, jnp.abs(cost - new_cost) <= function_tolerance * cost)
        collapsed = radius_new <= 1e-32
        stalled = jnp.logical_and(
            chol_ok, model_dec <= function_tolerance * jnp.maximum(cost, 1e-30))
        done_new = jnp.where(converged | collapsed | stalled, 1.0, 0.0)

        q_out = jnp.where(accept, q_new, q)
        t_out = jnp.where(accept, t_new, t)
        cost_out = jnp.where(accept, new_cost, cost)
        return (it + 1.0, done_new, q_out, t_out, cost_out, radius_new, df_new)

    init = (jnp.zeros(()), jnp.where(too_few, 1.0, 0.0), q0, t0, cost0,
            jnp.full((), initial_radius), jnp.full((), 2.0))
    it, done, q, t, cost, radius, _ = jax.lax.while_loop(cond, body, init)

    ran_out = jnp.logical_and(done < 0.5, it >= max_iter)
    invalid = jnp.logical_or(too_few, ran_out)
    # (q, t) is the last ACCEPTED iterate (steps only land on strict cost
    # decrease; for too_few rows the loop never ran so it IS the init). The
    # Ceres fallback-to-init for invalid rows happens in the wrapper, where
    # callers can opt out (fallback_to_init=False) for budgeted polishes.
    row = jnp.stack([q[0], q[1], q[2], q[3],
                     t[0], t[1], t[2], jnp.zeros(())])
    out_pose_ref[b, :] = row
    out_stat_ref[b, :] = jnp.stack([
        jnp.where(invalid, 1.0, 0.0), cost, it, radius,
        jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), jnp.zeros(())])


@functools.partial(jax.jit, static_argnames=(
    'max_iter', 'function_tolerance', 'interpret', 'fallback_to_init'))
def pallas_lm_refine(pose7_init: jax.Array, cam_K: jax.Array, pts3d: jax.Array,
                     pts2d: jax.Array, weights: jax.Array,
                     valid: jax.Array | None = None, *, max_iter: int = 50,
                     function_tolerance: float = 1e-6,
                     fallback_to_init: bool = True,
                     interpret: bool = False) -> LMResult:
    """Drop-in fused-kernel variant of solver.lm_refine (diagonal weights)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = pts2d.shape[:2]
    pad = (-N) % 128
    if weights.ndim == pts2d.ndim - 1:
        weights = weights[..., None]
    w2 = jnp.broadcast_to(weights, pts2d.shape).astype(jnp.float32)
    if valid is not None:
        w2 = w2 * valid[..., None].astype(jnp.float32)
        n_valid = jnp.sum(valid, axis=-1).astype(jnp.float32)
    else:
        n_valid = jnp.full((B,), float(N), jnp.float32)

    X = jnp.swapaxes(pts3d, -1, -2)                    # (B, 3, N)
    x2 = jnp.swapaxes(pts2d, -1, -2)                   # (B, 2, N)
    wT = jnp.swapaxes(w2, -1, -2)                      # (B, 2, N)
    if pad:
        X = jnp.pad(X, ((0, 0), (0, 0), (0, pad)))
        x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, pad)))
        wT = jnp.pad(wT, ((0, 0), (0, 0), (0, pad)))
    Np = N + pad

    pose_in = jnp.pad(pose7_init.astype(jnp.float32), ((0, 0), (0, 1)))
    K_packed = jnp.stack([cam_K[:, 0, 0], cam_K[:, 0, 1], cam_K[:, 1, 1],
                          cam_K[:, 0, 2], cam_K[:, 1, 2],
                          jnp.zeros((B,)), jnp.zeros((B,)), jnp.zeros((B,))],
                         axis=-1).astype(jnp.float32)
    meta = jnp.stack([n_valid] + [jnp.zeros((B,))] * 7, axis=-1)
    # full-array blocks must also satisfy the (8, 128) row tiling: pad B to 8
    Bp = (-B) % 8
    if Bp:
        pose_in = jnp.pad(pose_in, ((0, Bp), (0, 0)))
        K_packed = jnp.pad(K_packed, ((0, Bp), (0, 0)))
        meta = jnp.pad(meta, ((0, Bp), (0, 0)))

    kernel = functools.partial(
        _lm_kernel, max_iter=max_iter, function_tolerance=function_tolerance,
        min_relative_decrease=1e-3, initial_radius=1e4)

    Bfull = B + Bp
    out_pose, out_stat = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((Bfull, 8), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bfull, 8), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bfull, 8), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Bfull, 8), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bfull, 8), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bfull, 8), jnp.float32),
            jax.ShapeDtypeStruct((Bfull, 8), jnp.float32),
        ),
        interpret=interpret,
    )(meta, pose_in, K_packed, X, x2, wT)

    pose = out_pose[:B, :7]
    invalid = out_stat[:B, 0] > 0.5
    if fallback_to_init:   # Ceres contract: invalid solves keep the init
        pose = jnp.where(invalid[:, None], pose7_init.astype(pose.dtype), pose)
    return LMResult(pose7=pose, invalid=invalid,
                    cost=out_stat[:B, 1],
                    n_iter=out_stat[:B, 2].astype(jnp.int32),
                    radius=out_stat[:B, 3])
