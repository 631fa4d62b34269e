"""Small-matrix contractions as VPU elementwise ops.

On TPU, `dot_general` always engages the MXU with 128×128 tiles; contractions over
tiny dims (3-vector rotations, 6×6 normal equations, 11×11 DLT) waste >99% of every
tile — and under the f32 'highest' matmul policy they cost 6 passes each. Writing
them as broadcast-multiply + reduce keeps them on the VPU: exact f32 and an order
of magnitude faster for the PnP hot loops. Measured: the inference solve dropped
from 130 ms to the single-digit-ms range after this conversion.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rot_pts(pts: jax.Array, R: jax.Array) -> jax.Array:
    """pts (..., N, 3) @ Rᵀ (..., 3, 3) -> (..., N, 3), elementwise.

    Rows are (R @ p)ᵀ: out[..., n, i] = Σ_j R[..., i, j] · pts[..., n, j].
    """
    return jnp.sum(R[..., None, :, :] * pts[..., :, None, :], axis=-1)


def matvec3(M: jax.Array, v: jax.Array) -> jax.Array:
    """M (..., 3, 3) @ v (..., 3) -> (..., 3), elementwise."""
    return jnp.sum(M * v[..., None, :], axis=-1)


def mm_small(a: jax.Array, b: jax.Array) -> jax.Array:
    """a (..., m, k) @ b (..., k, n) for tiny m/k/n, elementwise."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def outer_accum_6(J: jax.Array, w: jax.Array) -> jax.Array:
    """H = Σ_{n,c} w[..., n, c] · J[..., n, c, :] Jᵀ -> (..., 6, 6).

    J: (..., N, 2, 6); w: (..., N, 2)."""
    wJ = J * w[..., None]
    return jnp.sum(wJ[..., :, None] * J[..., None, :], axis=(-4, -3))


def weighted_jtr_6(J: jax.Array, r: jax.Array, w: jax.Array) -> jax.Array:
    """g = Σ_{n,c} w·r·J -> (..., 6). J: (..., N, 2, 6); r, w: (..., N, 2)."""
    return jnp.sum(J * (w * r)[..., None], axis=(-3, -2))


def _chol_factor_lists(A):
    """Unrolled Cholesky of SPD A (..., n, n). Returns (L, Linv_diag, ok): L a
    lower-triangular list-of-lists of (...,) entries, ok False where a pivot
    was non-positive (not SPD; the clamped sqrt keeps the factor finite)."""
    n = A.shape[-1]
    eps = jnp.asarray(1e-30, A.dtype)
    ok = jnp.ones(A.shape[:-2], bool)
    L = [[None] * n for _ in range(n)]
    Linv_diag = [None] * n
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        ok = ok & (s > eps)
        Ljj = jnp.sqrt(jnp.maximum(s, eps))
        L[j][j] = Ljj
        Linv_diag[j] = 1.0 / Ljj
        for i in range(j + 1, n):
            t = A[..., i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * Linv_diag[j]
    return L, Linv_diag, ok


def _chol_substitute(L, Linv_diag, b, wide: bool):
    """Forward+back substitution from list factors. b: (..., n) or (..., n, m)."""
    n = len(Linv_diag)
    exp = (lambda a: a[..., None]) if wide else (lambda a: a)
    y = [None] * n
    for i in range(n):
        s = b[..., i] if not wide else b[..., i, :]
        for k in range(i):
            s = s - exp(L[i][k]) * y[k]
        y[i] = s * exp(Linv_diag[i])
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - exp(L[k][i]) * x[k]
        x[i] = s * exp(Linv_diag[i])
    return jnp.stack(x, axis=-1 if not wide else -2)


def chol_solve_small(A: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Solve SPD A (..., n, n) x = b (..., n) by a fully unrolled Cholesky.

    Returns (x, ok) with ok False where a pivot was non-positive (not SPD).
    `jnp.linalg.cholesky` + `cho_solve` lower to loop-based batched kernels on
    TPU — ~10× slower than this unrolled elementwise form for tiny static n
    (n ≤ ~12; op count is n³/3 scalars, all vectorized over the batch dims).
    Differentiable (pure jnp ops).
    """
    L, Linv_diag, ok = _chol_factor_lists(A)
    return _chol_substitute(L, Linv_diag, b, wide=False), ok


def chol_solve_small_mat(A: jax.Array, B: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Wide-RHS variant: solve A (..., n, n) X = B (..., n, m) -> (X, ok)."""
    L, Linv_diag, ok = _chol_factor_lists(A)
    return _chol_substitute(L, Linv_diag, B, wide=True), ok


def chol_factor_small(A: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Unrolled Cholesky returning the stacked lower factor (..., n, n) and ok
    — drop-in for jnp.linalg.cholesky on tiny SPD batches."""
    n = A.shape[-1]
    L, _, ok = _chol_factor_lists(A)
    zero = jnp.zeros_like(L[0][0])
    rows = [jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1)
            for i in range(n)]
    return jnp.stack(rows, axis=-2), ok


def inv3(M: jax.Array) -> jax.Array:
    """Closed-form adjugate inverse of (..., 3, 3) — jnp.linalg.inv lowers to a
    loop-based batched LU kernel on TPU; the adjugate is 9 cofactors and a
    divide, all elementwise over the batch."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det,
                              jnp.sign(det) * 1e-30 + (det == 0) * 1e-30)
    rows = jnp.stack([jnp.stack([A, B, C], -1),
                      jnp.stack([D, E, F], -1),
                      jnp.stack([G, H, I], -1)], -2)
    return rows * inv_det[..., None, None]


def jacobi_eigh_small(A: jax.Array, sweeps: int = 8
                      ) -> tuple[jax.Array, jax.Array]:
    """Symmetric eigendecomposition of tiny matrices by fully unrolled cyclic
    Jacobi. A (..., n, n) -> (eigvals (..., n) ascending, eigvecs (..., n, n)
    columns). `jnp.linalg.eigh` lowers to a loop-based batched kernel whose
    TPU compile alone takes minutes on some backends; for n ≤ ~6 the unrolled
    rotations are pure elementwise work."""
    n = A.shape[-1]
    V = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                app = A[..., p, p]
                aqq = A[..., q, q]
                apq = A[..., p, q]
                theta = 0.5 * jnp.arctan2(2.0 * apq, app - aqq)
                c = jnp.cos(theta)[..., None]
                s = jnp.sin(theta)[..., None]
                # A <- Jᵀ A J with J the (p, q) plane rotation
                Ap = A[..., p, :]
                Aq = A[..., q, :]
                A = A.at[..., p, :].set(c * Ap + s * Aq)
                A = A.at[..., q, :].set(-s * Ap + c * Aq)
                Ap = A[..., :, p]
                Aq = A[..., :, q]
                A = A.at[..., :, p].set(c * Ap + s * Aq)
                A = A.at[..., :, q].set(-s * Ap + c * Aq)
                Vp = V[..., :, p]
                Vq = V[..., :, q]
                V = V.at[..., :, p].set(c * Vp + s * Vq)
                V = V.at[..., :, q].set(-s * Vp + c * Vq)
    vals = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(vals, axis=-1)
    vals = jnp.take_along_axis(vals, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return vals, V


def _orthonormalize_cols(X: jax.Array) -> jax.Array:
    """Modified Gram-Schmidt over the (small, static) last axis."""
    k = X.shape[-1]
    out = []
    for i in range(k):
        v = X[..., i]
        for u in out:
            v = v - jnp.sum(u * v, axis=-1, keepdims=True) * u
        norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True),
                                    1e-30))
        out.append(v / norm)
    return jnp.stack(out, axis=-1)


def smallest_eigvecs(A: jax.Array, k: int, iters: int = 6
                     ) -> tuple[jax.Array, jax.Array]:
    """The k smallest eigenpairs of symmetric PSD A (..., n, n) without
    `jnp.linalg.eigh`: shifted inverse subspace iteration (unrolled Cholesky
    solves) + a Rayleigh-Ritz step with the unrolled Jacobi eigh on the k×k
    projection. Returns (eigvecs (..., n, k) ascending, eigvals (..., k)).

    Accuracy is set by the λ_k/λ_{k+1} gap (contamination ~(λ_k/λ_{k+1})^iters
    before Rayleigh-Ritz); for EPnP's 12×12 MᵀM the 4-dim near-null space is
    usually separated from the data-scale spectrum by orders of magnitude, but
    near-planar/noisy point sets can shrink the gap — 6 unrolled iterations
    (each one Cholesky solve + Gram-Schmidt, negligible next to the RANSAC
    scoring) keep a 2× gap accurate to ~(1/2)^6 before Rayleigh-Ritz. Below
    ~1.5× gap the returned basis degrades gracefully toward a mix of the
    adjacent eigenvectors (tested in TestSmallEigh.test_small_gap)."""
    n = A.shape[-1]
    tr = jnp.sum(jnp.diagonal(A, axis1=-2, axis2=-1), axis=-1)
    shift = (1e-6 * tr / n + 1e-25)[..., None, None]
    eye = jnp.eye(n, dtype=A.dtype)
    Ash = A + shift * eye
    # deterministic dense init (identity columns can be accidentally orthogonal
    # to the target subspace; a fixed random basis almost surely is not)
    import numpy as _np
    X0 = _np.linalg.qr(_np.random.default_rng(7).normal(size=(n, k)))[0]
    X = jnp.broadcast_to(jnp.asarray(X0, A.dtype), A.shape[:-2] + (n, k))
    for _ in range(iters):
        X, _ = chol_solve_small_mat(Ash, X)
        X = _orthonormalize_cols(X)
    T = mm_small(jnp.swapaxes(X, -1, -2), mm_small(A, X))      # (..., k, k)
    T = 0.5 * (T + jnp.swapaxes(T, -1, -2))
    vals, Q = jacobi_eigh_small(T)
    return mm_small(X, Q), vals
