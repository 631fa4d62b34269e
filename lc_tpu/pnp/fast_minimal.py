"""Minimal-sample PnP estimators in scalar-struct form — the RANSAC hot path.

The generic `epnp`/`dlt_pnp`/`planar_pnp` operate on (..., N, 3) tensors with
stacked matrices, einsum contractions, and `.at[]` updates. For the hypothesis
stage that layout is ~60× off the VPU roofline: the batch of B×K ≈ 4800
six-point problems turns into hundreds of tiny kernels separated by fusion
breakers (stack/concat/scatter), and the small einsums dispatch onto the MXU
with >99% tile padding (measured: 2.9 ms for the EPnP hypotheses alone where
the raw arithmetic is ~50 µs of VPU time).

Here every solver variable is ONE (P,) lane vector (P = B·K problems) and the
entire solve — PCA control points, barycentric inversion, the 12×12 normal
matrix, its near-null 4-space by shifted inverse iteration, the β
Gauss-Newton, Procrustes/polar — is straight-line elementwise code with
Python-unrolled indices: no stacking, no contractions, no scatters. XLA fuses
it into a handful of VPU kernels over (P,) tiles.

Semantics match `epnp(..., gn_iters=4, eig_iters=3, cp_sweeps=4)` (the cheap
hypothesis mode) up to iteration-order floating-point differences; pinned by
tests/test_pnp.py::TestFastMinimal against the reference implementation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# small dense helpers on lists of (P,) lane vectors
# ---------------------------------------------------------------------------

def _jacobi_sym(a, V, pairs, sweeps):
    """Cyclic Jacobi on a symmetric matrix stored as a dict {(i,j): (P,)}
    (upper triangle, i<=j) with eigenvector columns V[i][k] ((P,) each).
    Plain variable rebinding — no scatters."""
    n = len(V)

    def get(i, j):
        return a[(i, j)] if i <= j else a[(j, i)]

    def put(i, j, val):
        a[(min(i, j), max(i, j))] = val

    for _ in range(sweeps):
        for (p, q) in pairs:
            app = get(p, p)
            aqq = get(q, q)
            apq = get(p, q)
            theta = 0.5 * jnp.arctan2(2.0 * apq, app - aqq)
            c = jnp.cos(theta)
            s = jnp.sin(theta)
            # rows/cols p and q of A
            old = {k: get(p, k) for k in range(n)}
            oldq = {k: get(q, k) for k in range(n)}
            for k in range(n):
                if k == p or k == q:
                    continue
                put(p, k, c * old[k] + s * oldq[k])
                put(q, k, -s * old[k] + c * oldq[k])
            app_n = c * c * app + 2.0 * s * c * apq + s * s * aqq
            aqq_n = s * s * app - 2.0 * s * c * apq + c * c * aqq
            put(p, p, app_n)
            put(q, q, aqq_n)
            put(p, q, jnp.zeros_like(apq))
            for i in range(n):
                vp = V[i][p]
                vq = V[i][q]
                V[i][p] = c * vp + s * vq
                V[i][q] = -s * vp + c * vq
    return a, V


def _eigh3(cxx, cxy, cxz, cyy, cyz, czz, sweeps=4):
    """Symmetric 3×3 eigendecomposition; returns (vals ascending [3],
    vecs[i][k] with columns = eigenvectors)."""
    a = {(0, 0): cxx, (0, 1): cxy, (0, 2): cxz,
         (1, 1): cyy, (1, 2): cyz, (2, 2): czz}
    one = jnp.ones_like(cxx)
    zero = jnp.zeros_like(cxx)
    V = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]
    a, V = _jacobi_sym(a, V, [(0, 1), (0, 2), (1, 2)], sweeps)
    vals = [a[(0, 0)], a[(1, 1)], a[(2, 2)]]

    # branchless 3-element sort (ascending) carrying the columns along
    def cswap(i, j):
        swap = vals[i] > vals[j]
        vi, vj = vals[i], vals[j]
        vals[i] = jnp.where(swap, vj, vi)
        vals[j] = jnp.where(swap, vi, vj)
        for r in range(3):
            ci, cj = V[r][i], V[r][j]
            V[r][i] = jnp.where(swap, cj, ci)
            V[r][j] = jnp.where(swap, ci, cj)
    cswap(0, 1)
    cswap(1, 2)
    cswap(0, 1)
    return vals, V


def _chol_lists(A, n):
    """Unrolled Cholesky of a symmetric matrix stored sparsely as
    {(i,j) -> (P,)} with i<=j; ABSENT keys are structural zeros. Returns
    (L rows, inv diag, ok)."""
    eps = 1e-30

    def get(i, j):
        return A.get((min(i, j), max(i, j)))

    ok = None
    L = [[None] * n for _ in range(n)]
    Ld = [None] * n
    for j in range(n):
        s = get(j, j)   # diagonals are always present
        for k in range(j):
            if L[j][k] is not None:
                s = s - L[j][k] * L[j][k]
        okj = s > eps
        ok = okj if ok is None else (ok & okj)
        Ljj = jnp.sqrt(jnp.maximum(s, eps))
        L[j][j] = Ljj
        Ld[j] = 1.0 / Ljj
        for i in range(j + 1, n):
            t = get(i, j)
            for k in range(j):
                if L[i][k] is not None and L[j][k] is not None:
                    term = L[i][k] * L[j][k]
                    t = -term if t is None else t - term
            L[i][j] = None if t is None else t * Ld[j]
    return L, Ld, ok


def _chol_solve_lists(L, Ld, b, n):
    """Forward+back substitution; b is a list of n (P,) vectors. L entries of
    None are structural zeros (sparse Cholesky from _chol_lists)."""
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            if L[i][k] is not None:
                s = s - L[i][k] * y[k]
        y[i] = s * Ld[i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            if L[k][i] is not None:
                s = s - L[k][i] * x[k]
        x[i] = s * Ld[i]
    return x


def _polar3(M, iters=12):
    """Newton–Schulz polar factor of a 3×3 given as rows of lists [[m00..]].
    M[i][j] are (P,) vectors."""
    fro = jnp.zeros_like(M[0][0])
    for i in range(3):
        for j in range(3):
            fro = fro + M[i][j] * M[i][j]
    inv = 1.0 / jnp.sqrt(jnp.maximum(fro, 1e-20))
    X = [[M[i][j] * inv for j in range(3)] for i in range(3)]
    for _ in range(iters):
        # G = X Xᵀ
        G = [[sum(X[i][k] * X[j][k] for k in range(3)) for j in range(3)]
             for i in range(3)]
        # X <- 1.5 X − 0.5 G X
        X = [[1.5 * X[i][j] - 0.5 * sum(G[i][k] * X[k][j] for k in range(3))
              for j in range(3)] for i in range(3)]
    return X


def _det3_rows(R):
    return (R[0][0] * (R[1][1] * R[2][2] - R[1][2] * R[2][1])
            - R[0][1] * (R[1][0] * R[2][2] - R[1][2] * R[2][0])
            + R[0][2] * (R[1][0] * R[2][1] - R[1][1] * R[2][0]))


def _quat_from_rows(R):
    """Branchless Shepperd quaternion (w, x, y, z) from rotation rows."""
    m00, m01, m02 = R[0]
    m10, m11, m12 = R[1]
    m20, m21, m22 = R[2]
    tr = m00 + m11 + m22
    # four candidate magnitudes
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)
    # candidate quaternions (unnormalized), one per pivot
    cands = [
        (qw2, m21 - m12, m02 - m20, m10 - m01),
        (m21 - m12, qx2, m01 + m10, m02 + m20),
        (m02 - m20, m01 + m10, qy2, m12 + m21),
        (m10 - m01, m02 + m20, m12 + m21, qz2),
    ]
    mags = [qw2, qx2, qy2, qz2]
    best = mags[0]
    out = list(cands[0])
    for i in range(1, 4):
        better = mags[i] > best
        out = [jnp.where(better, cands[i][k], out[k]) for k in range(4)]
        best = jnp.where(better, mags[i], best)
    norm = jnp.sqrt(out[0] * out[0] + out[1] * out[1]
                    + out[2] * out[2] + out[3] * out[3])
    inv = 1.0 / jnp.maximum(norm, 1e-20)
    sign = jnp.where(out[0] < 0, -1.0, 1.0)   # standardize w >= 0
    return [o * inv * sign for o in out]


# ---------------------------------------------------------------------------
# the EPnP-6 hypothesis solver
# ---------------------------------------------------------------------------

def epnp6_scalar(x, y, z, u, v, fx, fy, cx, cy, *, eig_iters=3, gn_iters=4,
                 pca_sweeps=4):
    """EPnP on 6-point minimal samples, scalar-struct over (P,) problems.

    x, y, z, u, v: lists of 6 (P,) coordinate vectors; fx/fy/cx/cy: (P,).
    Returns (pose7 (P, 7), ok (P,)). Matches pnp.epnp's cheap hypothesis mode
    (same algorithm, unrolled layout)."""
    S = 6
    inv_s = 1.0 / S
    c0x = sum(x) * inv_s
    c0y = sum(y) * inv_s
    c0z = sum(z) * inv_s
    dx = [xi - c0x for xi in x]
    dy = [yi - c0y for yi in y]
    dz = [zi - c0z for zi in z]
    cxx = sum(d * d for d in dx) * inv_s
    cyy = sum(d * d for d in dy) * inv_s
    czz = sum(d * d for d in dz) * inv_s
    cxy = sum(a * b for a, b in zip(dx, dy)) * inv_s
    cxz = sum(a * b for a, b in zip(dx, dz)) * inv_s
    cyz = sum(a * b for a, b in zip(dy, dz)) * inv_s
    vals, V3 = _eigh3(cxx, cxy, cxz, cyy, cyz, czz, sweeps=pca_sweeps)
    scale = [jnp.sqrt(jnp.maximum(w, 1e-9)) for w in vals]
    # world control points: c0 and c0 + axes (axes = eigvec col k scaled)
    ctrl = [(c0x, c0y, c0z)]
    for k in range(3):
        ctrl.append((c0x + V3[0][k] * scale[k],
                     c0y + V3[1][k] * scale[k],
                     c0z + V3[2][k] * scale[k]))

    # barycentric: basis columns = ctrl[k+1]-ctrl[0] = axes; invert the 3×3
    # whose COLUMNS are the axes: B_ij = V3[i][j]*scale[j]
    b00, b01, b02 = V3[0][0] * scale[0], V3[0][1] * scale[1], V3[0][2] * scale[2]
    b10, b11, b12 = V3[1][0] * scale[0], V3[1][1] * scale[1], V3[1][2] * scale[2]
    b20, b21, b22 = V3[2][0] * scale[0], V3[2][1] * scale[1], V3[2][2] * scale[2]
    A00 = b11 * b22 - b12 * b21
    A01 = b02 * b21 - b01 * b22
    A02 = b01 * b12 - b02 * b11
    A10 = b12 * b20 - b10 * b22
    A11 = b00 * b22 - b02 * b20
    A12 = b02 * b10 - b00 * b12
    A20 = b10 * b21 - b11 * b20
    A21 = b01 * b20 - b00 * b21
    A22 = b00 * b11 - b01 * b10
    det = b00 * A00 + b01 * A10 + b02 * A20
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    # alphas per point: a0 = 1-β1-β2-β3, (β) = B⁻¹ (X - c0)
    alph = []
    for j in range(S):
        b1 = (A00 * dx[j] + A01 * dy[j] + A02 * dz[j]) * inv_det
        b2 = (A10 * dx[j] + A11 * dy[j] + A12 * dz[j]) * inv_det
        b3 = (A20 * dx[j] + A21 * dy[j] + A22 * dz[j]) * inv_det
        alph.append((1.0 - b1 - b2 - b3, b1, b2, b3))

    # MtM (12×12, symmetric, (x,y) block identically zero):
    #   (x_l, x_m) = fx² S_lm            (y_l, y_m) = fy² S_lm
    #   (x_l, z_m) = fx T^u_lm           (y_l, z_m) = fy T^v_lm
    #   (z_l, z_m) = U_lm
    # with S_lm = Σ a_l a_m, T^u_lm = Σ a_l a_m (cx−u), T^v = Σ a_l a_m (cy−v),
    # U_lm = Σ a_l a_m ((cx−u)² + (cy−v)²)
    cu = [cx - ui for ui in u]
    cv = [cy - vi for vi in v]
    MtM = {}
    for l in range(4):
        for m in range(l, 4):
            s_lm = sum(alph[j][l] * alph[j][m] for j in range(S))
            tu = sum(alph[j][l] * alph[j][m] * cu[j] for j in range(S))
            tv = sum(alph[j][l] * alph[j][m] * cv[j] for j in range(S))
            uu = sum(alph[j][l] * alph[j][m]
                     * (cu[j] * cu[j] + cv[j] * cv[j]) for j in range(S))
            MtM[(l, m)] = fx * fx * s_lm
            MtM[(4 + l, 4 + m)] = fy * fy * s_lm
            MtM[(8 + l, 8 + m)] = uu
            MtM[(l, 8 + m)] = fx * tu
            MtM[(4 + l, 8 + m)] = fy * tv
            if m != l:   # the (z_l, x_m)/(z_l, y_m) mirrored entries
                MtM[(m, 8 + l)] = fx * tu
                MtM[(4 + m, 8 + l)] = fy * tv

    # shifted inverse subspace iteration for the 4 smallest eigvecs
    tr = sum(MtM[(i, i)] for i in range(12))
    shift = 1e-6 * tr / 12.0 + 1e-25
    Ash = dict(MtM)
    for i in range(12):
        Ash[(i, i)] = Ash[(i, i)] + shift
    L, Ld, chol_ok = _chol_lists(Ash, 12)
    # deterministic start basis (same QR'd Gaussian as smallmat)
    import numpy as _np
    X0 = _np.linalg.qr(_np.random.default_rng(7).normal(size=(12, 4)))[0]
    one = jnp.ones_like(fx)
    X = [[one * float(X0[i, k]) for k in range(4)] for i in range(12)]
    for _ in range(eig_iters):
        cols = [ _chol_solve_lists(L, Ld, [X[i][k] for i in range(12)], 12)
                 for k in range(4)]
        X = [[cols[k][i] for k in range(4)] for i in range(12)]
        # modified Gram-Schmidt over the 4 columns
        for kcol in range(4):
            for kprev in range(kcol):
                dot = sum(X[i][kprev] * X[i][kcol] for i in range(12))
                for i in range(12):
                    X[i][kcol] = X[i][kcol] - dot * X[i][kprev]
            nrm = jnp.sqrt(jnp.maximum(
                sum(X[i][kcol] * X[i][kcol] for i in range(12)), 1e-30))
            inv_n = 1.0 / nrm
            for i in range(12):
                X[i][kcol] = X[i][kcol] * inv_n

    # Rayleigh-Ritz: T = Xᵀ MtM X (4×4), jacobi, rotate X
    def mtm_get(i, j):
        if (i, j) in MtM:
            return MtM[(i, j)]
        if (j, i) in MtM:
            return MtM[(j, i)]
        return None
    Y = [[None] * 4 for _ in range(12)]
    for i in range(12):
        for k in range(4):
            scol = None
            for j in range(12):
                mij = mtm_get(i, j)
                if mij is None:
                    continue
                term = mij * X[j][k]
                scol = term if scol is None else scol + term
            Y[i][k] = scol
    T = {}
    for a_ in range(4):
        for b_ in range(a_, 4):
            T[(a_, b_)] = sum(X[i][a_] * Y[i][b_] for i in range(12))
    zero = jnp.zeros_like(fx)
    Q = [[one if i == k else zero for k in range(4)] for i in range(4)]
    T, Q = _jacobi_sym(T, Q, [(p, q) for p in range(3) for q in range(p + 1, 4)],
                       8)
    tvals = [T[(k, k)] for k in range(4)]
    Vb = [[sum(X[i][j] * Q[j][k] for j in range(4)) for k in range(4)]
          for i in range(12)]
    # ascending order of the 4 Ritz values (branchless sort network)
    def cswap4(i, j):
        swap = tvals[i] > tvals[j]
        ti, tj = tvals[i], tvals[j]
        tvals[i] = jnp.where(swap, tj, ti)
        tvals[j] = jnp.where(swap, ti, tj)
        for r in range(12):
            ci, cj = Vb[r][i], Vb[r][j]
            Vb[r][i] = jnp.where(swap, cj, ci)
            Vb[r][j] = jnp.where(swap, ci, cj)
    for (i, j) in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
        cswap4(i, j)

    # camera-frame control-point candidates per basis vector k:
    # Vc[k][p] = (x, y, z) with x = Vb[p][k], y = Vb[4+p][k], z = Vb[8+p][k]
    # 6 pairwise distance vectors of the world control points
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    d_w = []
    for (i, j) in pairs:
        ddx = ctrl[i][0] - ctrl[j][0]
        ddy = ctrl[i][1] - ctrl[j][1]
        ddz = ctrl[i][2] - ctrl[j][2]
        d_w.append(jnp.sqrt(jnp.maximum(ddx * ddx + ddy * ddy + ddz * ddz,
                                        1e-30)))
    # per-basis-k pairwise difference vectors (for β-GN): diffs[pair][k] = 3
    diffs = [[(Vb[i][k] - Vb[j][k], Vb[4 + i][k] - Vb[4 + j][k],
               Vb[8 + i][k] - Vb[8 + j][k]) for k in range(4)]
             for (i, j) in pairs]
    # β init from the N=1 case (basis vector 0 = smallest)
    num = zero
    den = zero
    for p in range(6):
        d0, d1, d2 = diffs[p][0]
        dv = jnp.sqrt(jnp.maximum(d0 * d0 + d1 * d1 + d2 * d2, 1e-30))
        num = num + dv * d_w[p]
        den = den + dv * dv
    betas = [num / jnp.maximum(den, 1e-12), zero, zero, zero]

    # Gauss-Newton on the 6 squared-distance constraints over 4 betas
    for _ in range(gn_iters):
        Jt = [[None] * 6 for _ in range(4)]
        r = [None] * 6
        for p in range(6):
            e0 = sum(betas[k] * diffs[p][k][0] for k in range(4))
            e1 = sum(betas[k] * diffs[p][k][1] for k in range(4))
            e2 = sum(betas[k] * diffs[p][k][2] for k in range(4))
            r[p] = e0 * e0 + e1 * e1 + e2 * e2 - d_w[p] * d_w[p]
            for k in range(4):
                Jt[k][p] = 2.0 * (e0 * diffs[p][k][0] + e1 * diffs[p][k][1]
                                  + e2 * diffs[p][k][2])
        JtJ = {}
        for a_ in range(4):
            for b_ in range(a_, 4):
                JtJ[(a_, b_)] = sum(Jt[a_][p] * Jt[b_][p] for p in range(6))
            JtJ[(a_, a_)] = JtJ[(a_, a_)] + 1e-9
        Jtr = [sum(Jt[k][p] * r[p] for p in range(6)) for k in range(4)]
        Lb, Lbd, _ = _chol_lists(JtJ, 4)
        db = _chol_solve_lists(Lb, Lbd, Jtr, 4)
        betas = [betas[k] - jnp.nan_to_num(db[k]) for k in range(4)]

    # camera control points; cheirality by the mean z of the 6 points
    cc = [(sum(betas[k] * Vb[p][k] for k in range(4)),
           sum(betas[k] * Vb[4 + p][k] for k in range(4)),
           sum(betas[k] * Vb[8 + p][k] for k in range(4))) for p in range(4)]
    mean_z = zero
    for j in range(S):
        mean_z = mean_z + sum(alph[j][p] * cc[p][2] for p in range(4))
    flip = jnp.where(mean_z < 0, -1.0, 1.0)
    cc = [(cx_ * flip, cy_ * flip, cz_ * flip) for (cx_, cy_, cz_) in cc]

    # Procrustes world→camera on the 4 control points
    mwx = sum(c[0] for c in ctrl) * 0.25
    mwy = sum(c[1] for c in ctrl) * 0.25
    mwz = sum(c[2] for c in ctrl) * 0.25
    mcx = sum(c[0] for c in cc) * 0.25
    mcy = sum(c[1] for c in cc) * 0.25
    mcz = sum(c[2] for c in cc) * 0.25
    H = [[zero] * 3 for _ in range(3)]
    for p in range(4):
        a3 = (cc[p][0] - mcx, cc[p][1] - mcy, cc[p][2] - mcz)
        b3 = (ctrl[p][0] - mwx, ctrl[p][1] - mwy, ctrl[p][2] - mwz)
        for i in range(3):
            for j in range(3):
                H[i][j] = H[i][j] + a3[i] * b3[j]
    R = _polar3(H)
    ok = chol_ok & (_det3_rows(R) > 0)
    tx = mcx - (R[0][0] * mwx + R[0][1] * mwy + R[0][2] * mwz)
    ty = mcy - (R[1][0] * mwx + R[1][1] * mwy + R[1][2] * mwz)
    tz = mcz - (R[2][0] * mwx + R[2][1] * mwy + R[2][2] * mwz)
    q = _quat_from_rows(R)

    pose = jnp.stack([q[0], q[1], q[2], q[3], tx, ty, tz], axis=-1)
    finite = jnp.all(jnp.isfinite(pose), axis=-1)
    ok = ok & finite
    default = jnp.zeros_like(pose).at[..., 0].set(1.0).at[..., 6].set(1.0)
    return jnp.where(finite[..., None], pose, default), ok


def epnp6_fast(cam_K: jax.Array, sub3d: jax.Array, sub2d: jax.Array,
               **kw) -> tuple[jax.Array, jax.Array]:
    """Adapter: cam_K (B, 1, 3, 3) or (B, 3, 3); sub3d (B, K, 6, 3); sub2d
    (B, K, 6, 2) → (pose7 (B, K, 7), ok (B, K)) — drop-in for the epnp call
    in ransac_pnp's hypothesis stage."""
    (B, K), x, y, z, u, v, Ke = _to_lanes(cam_K, sub3d, sub2d)
    pose, ok = epnp6_scalar(x, y, z, u, v, Ke[:, 0], Ke[:, 1], Ke[:, 2],
                            Ke[:, 3], **kw)
    return pose.reshape(B, K, 7), ok.reshape(B, K)


# ---------------------------------------------------------------------------
# DLT-6 and planar-homography-6, same scalar-struct layout
# ---------------------------------------------------------------------------

def dlt6_scalar(x, y, z, u, v, fx, fy, cx, cy):
    """Ridge-regularized inhomogeneous DLT on 6-point samples ((P,) lanes).
    Matches pnp.ransac.dlt_pnp semantics (normalized 3D frame, P[2,3]=1,
    11×11 ridge Cholesky, Newton–Schulz polar)."""
    S = 6
    inv_s = 1.0 / S
    # normalized image coords (inverse intrinsics, no skew)
    xn = [(ui - cx) / fx for ui in u]
    yn = [(vi - cy) / fy for vi in v]
    # center + unit-RMS scale the 3D points
    c0x = sum(x) * inv_s
    c0y = sum(y) * inv_s
    c0z = sum(z) * inv_s
    dx = [xi - c0x for xi in x]
    dy = [yi - c0y for yi in y]
    dz = [zi - c0z for zi in z]
    ms = sum(a * a + b * b + c * c for a, b, c in zip(dx, dy, dz)) * inv_s
    s3d = jnp.maximum(jnp.sqrt(ms / 3.0), 1e-6)
    inv3d = 1.0 / s3d
    X = [d * inv3d for d in dx]
    Y = [d * inv3d for d in dy]
    Z = [d * inv3d for d in dz]

    # rows per point: ru = [X Y Z 1 0000 −u·X −u·Y −u·Z] = xn
    #                 rv = [0000 X Y Z 1 −v·X −v·Y −v·Z] = yn
    # AtA (11×11) and Atb assembled entry-wise; block structure:
    #   rows 0-3 only meet ru; rows 4-7 only rv; rows 8-10 both.
    one = jnp.ones_like(fx)
    ru = [[X[j], Y[j], Z[j], one] for j in range(S)]
    w3 = [[-xn[j] * X[j], -xn[j] * Y[j], -xn[j] * Z[j]] for j in range(S)]
    w3v = [[-yn[j] * X[j], -yn[j] * Y[j], -yn[j] * Z[j]] for j in range(S)]
    A = {}
    b = [None] * 11

    def acc(i, jdx, val):
        key = (min(i, jdx), max(i, jdx))
        A[key] = val if key not in A else A[key] + val

    for j in range(S):
        # row layout (conceptual): [ru[j], 0,0,0,0, w3[j]] — assembled below
        # u-row contributions
        for a_ in range(4):
            for b_ in range(a_, 4):
                acc(a_, b_, ru[j][a_] * ru[j][b_])
            for b_ in range(3):
                acc(a_, 8 + b_, ru[j][a_] * w3[j][b_])
            if b[a_] is None:
                b[a_] = ru[j][a_] * xn[j]
            else:
                b[a_] = b[a_] + ru[j][a_] * xn[j]
        # v-row contributions
        for a_ in range(4):
            for b_ in range(a_, 4):
                acc(4 + a_, 4 + b_, ru[j][a_] * ru[j][b_])
            for b_ in range(3):
                acc(4 + a_, 8 + b_, ru[j][a_] * w3v[j][b_])
            if b[4 + a_] is None:
                b[4 + a_] = ru[j][a_] * yn[j]
            else:
                b[4 + a_] = b[4 + a_] + ru[j][a_] * yn[j]
        # w-block (both rows)
        for a_ in range(3):
            for b_ in range(a_, 3):
                acc(8 + a_, 8 + b_,
                    w3[j][a_] * w3[j][b_] + w3v[j][a_] * w3v[j][b_])
            t = w3[j][a_] * xn[j] + w3v[j][a_] * yn[j]
            if b[8 + a_] is None:
                b[8 + a_] = t
            else:
                b[8 + a_] = b[8 + a_] + t
    for i in range(11):
        A[(i, i)] = A[(i, i)] + 1e-8
    L, Ld, chol_ok = _chol_lists(A, 11)
    h = _chol_solve_lists(L, Ld, b, 11)

    # P' = λ'[R | t'] for normalized X': rows of M from h
    M = [[h[0], h[1], h[2]], [h[4], h[5], h[6]], [h[8], h[9], h[10]]]
    t_vec = [h[3], h[7], one]
    R = _polar3(M)
    lam_p = sum(R[i][j] * M[i][j] for i in range(3) for j in range(3)) / 3.0
    lam = lam_p * inv3d
    ok = chol_ok & (lam > 1e-12) & (_det3_rows(R) > 0)
    inv_lam = 1.0 / jnp.maximum(lam, 1e-12)
    Rc = [R[i][0] * c0x + R[i][1] * c0y + R[i][2] * c0z for i in range(3)]
    tx = t_vec[0] * inv_lam - Rc[0]
    ty = t_vec[1] * inv_lam - Rc[1]
    tz = t_vec[2] * inv_lam - Rc[2]
    q = _quat_from_rows(R)
    pose = jnp.stack([q[0], q[1], q[2], q[3], tx, ty, tz], axis=-1)
    finite = jnp.all(jnp.isfinite(pose), axis=-1)
    ok = ok & finite
    default = jnp.zeros_like(pose).at[..., 0].set(1.0).at[..., 6].set(1.0)
    return jnp.where(finite[..., None], pose, default), ok


def planar6_scalar(x, y, z, u, v, fx, fy, cx, cy, pca_sweeps=4):
    """Plane-PCA + 8-DOF homography + Zhang decomposition on 6-point samples
    ((P,) lanes). Matches pnp.ransac.planar_pnp semantics."""
    S = 6
    inv_s = 1.0 / S
    c0x = sum(x) * inv_s
    c0y = sum(y) * inv_s
    c0z = sum(z) * inv_s
    dx = [xi - c0x for xi in x]
    dy = [yi - c0y for yi in y]
    dz = [zi - c0z for zi in z]
    cxx = sum(d * d for d in dx)
    cyy = sum(d * d for d in dy)
    czz = sum(d * d for d in dz)
    cxy = sum(a * b for a, b in zip(dx, dy))
    cxz = sum(a * b for a, b in zip(dx, dz))
    cyz = sum(a * b for a, b in zip(dy, dz))
    vals, V3 = _eigh3(cxx, cxy, cxz, cyy, cyz, czz, sweeps=pca_sweeps)
    b1 = (V3[0][2], V3[1][2], V3[2][2])     # largest two = in-plane
    b2 = (V3[0][1], V3[1][1], V3[2][1])
    q1 = [dx[j] * b1[0] + dy[j] * b1[1] + dz[j] * b1[2] for j in range(S)]
    q2 = [dx[j] * b2[0] + dy[j] * b2[1] + dz[j] * b2[2] for j in range(S)]
    qs = jnp.sqrt(jnp.maximum(
        sum(a * a + b * b for a, b in zip(q1, q2)) * inv_s * 0.5, 1e-12))
    inv_qs = 1.0 / qs
    q1 = [a * inv_qs for a in q1]
    q2 = [a * inv_qs for a in q2]
    xn = [(ui - cx) / fx for ui in u]
    yn = [(vi - cy) / fy for vi in v]

    # 8-unknown homography rows: [q1 q2 1 000 −x q1 −x q2] = x; v-row likewise
    one = jnp.ones_like(fx)
    A = {}
    b = [None] * 8

    def acc(i, jdx, val):
        key = (min(i, jdx), max(i, jdx))
        A[key] = val if key not in A else A[key] + val

    for j in range(S):
        r3 = [q1[j], q2[j], one]
        wu = [-xn[j] * q1[j], -xn[j] * q2[j]]
        wv = [-yn[j] * q1[j], -yn[j] * q2[j]]
        for a_ in range(3):
            for b_ in range(a_, 3):
                acc(a_, b_, r3[a_] * r3[b_])
                acc(3 + a_, 3 + b_, r3[a_] * r3[b_])
            for b_ in range(2):
                acc(a_, 6 + b_, r3[a_] * wu[b_])
                acc(3 + a_, 6 + b_, r3[a_] * wv[b_])
            tu = r3[a_] * xn[j]
            tv = r3[a_] * yn[j]
            b[a_] = tu if b[a_] is None else b[a_] + tu
            b[3 + a_] = tv if b[3 + a_] is None else b[3 + a_] + tv
        for a_ in range(2):
            for b_ in range(a_, 2):
                acc(6 + a_, 6 + b_, wu[a_] * wu[b_] + wv[a_] * wv[b_])
            t = wu[a_] * xn[j] + wv[a_] * yn[j]
            b[6 + a_] = t if b[6 + a_] is None else b[6 + a_] + t
    for i in range(8):
        A[(i, i)] = A[(i, i)] + 1e-8
    L, Ld, chol_ok = _chol_lists(A, 8)
    h = _chol_solve_lists(L, Ld, b, 8)

    h1 = (h[0], h[3], h[6])
    h2 = (h[1], h[4], h[7])
    h3 = (h[2], h[5], one)
    n1 = jnp.sqrt(h1[0] ** 2 + h1[1] ** 2 + h1[2] ** 2)
    n2 = jnp.sqrt(h2[0] ** 2 + h2[1] ** 2 + h2[2] ** 2)
    lam = 2.0 / jnp.maximum(n1 + n2, 1e-12)
    r1 = [lam * c for c in h1]
    r2 = [lam * c for c in h2]
    r3 = [r1[1] * r2[2] - r1[2] * r2[1],
          r1[2] * r2[0] - r1[0] * r2[2],
          r1[0] * r2[1] - r1[1] * r2[0]]
    Rp = _polar3([[r1[0], r2[0], r3[0]],
                  [r1[1], r2[1], r3[1]],
                  [r1[2], r2[2], r3[2]]])
    tp = [lam * c for c in h3]
    # world frame: columns (b1, b2, b1×b2)
    b3 = (b1[1] * b2[2] - b1[2] * b2[1],
          b1[2] * b2[0] - b1[0] * b2[2],
          b1[0] * b2[1] - b1[1] * b2[0])
    Bf = [[b1[i], b2[i], b3[i]] for i in range(3)]
    Rw = [[sum(Rp[i][k] * Bf[j][k] for k in range(3)) for j in range(3)]
          for i in range(3)]
    tw = [tp[i] * qs - (Rw[i][0] * c0x + Rw[i][1] * c0y + Rw[i][2] * c0z)
          for i in range(3)]
    ok = chol_ok & (_det3_rows(Rw) > 0) & (tw[2] > 0)
    q = _quat_from_rows(Rw)
    pose = jnp.stack([q[0], q[1], q[2], q[3], tw[0], tw[1], tw[2]], axis=-1)
    finite = jnp.all(jnp.isfinite(pose), axis=-1)
    ok = ok & finite
    default = jnp.zeros_like(pose).at[..., 0].set(1.0).at[..., 6].set(1.0)
    return jnp.where(finite[..., None], pose, default), ok


def _to_lanes(cam_K, sub3d, sub2d):
    B, K = sub3d.shape[:2]
    P = B * K
    p3 = sub3d.reshape(P, 6, 3)
    p2 = sub2d.reshape(P, 6, 2)
    x = [p3[:, j, 0] for j in range(6)]
    y = [p3[:, j, 1] for j in range(6)]
    z = [p3[:, j, 2] for j in range(6)]
    u = [p2[:, j, 0] for j in range(6)]
    v = [p2[:, j, 1] for j in range(6)]
    Km = cam_K.reshape(B, -1)[:, [0, 4, 2, 5]]      # fx, fy, cx, cy
    Ke = jnp.repeat(Km, K, axis=0)
    return (B, K), x, y, z, u, v, Ke


def dlt6_fast(cam_K, sub3d, sub2d):
    (B, K), x, y, z, u, v, Ke = _to_lanes(cam_K, sub3d, sub2d)
    pose, ok = dlt6_scalar(x, y, z, u, v, Ke[:, 0], Ke[:, 1], Ke[:, 2],
                           Ke[:, 3])
    return pose.reshape(B, K, 7), ok.reshape(B, K)


def planar6_fast(cam_K, sub3d, sub2d, pca_sweeps=4):
    (B, K), x, y, z, u, v, Ke = _to_lanes(cam_K, sub3d, sub2d)
    pose, ok = planar6_scalar(x, y, z, u, v, Ke[:, 0], Ke[:, 1], Ke[:, 2],
                              Ke[:, 3], pca_sweeps=pca_sweeps)
    return pose.reshape(B, K, 7), ok.reshape(B, K)
