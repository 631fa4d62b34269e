"""Symmetric-object handling.

Candidate generation runs host-side (numpy, once per sample); best-candidate selection
runs on device (jnp, jit/vmap-safe, fixed candidate count K with validity masking —
the TPU-native replacement for the reference's ragged per-chunk torchscript selection,
reference symmetry.py:9-93).
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

# Per-dataset symmetric object ids (reference dataset.py:21-35 /
# lib/utils/evaluate.py:20-34 — the two reference copies are identical; kept
# once here for both the data pipeline and the evaluator).
DATASET_SYMMETRIC_OBJ_IDS = {
    "lm": [3, 7, 10, 11],
    "lmo": [10, 11],
    "tless": list(range(1, 31)),
    "tudl": [],
    "tyol": [3, 4, 5, 6, 7, 8, 10, 11, 12, 13, 15, 16, 17, 18, 19, 21],
    "ruapc": [8, 9, 12, 13],
    "icmi": [1, 2, 6],
    "icbin": [1],
    "itodd": [2, 3, 4, 5, 7, 8, 9, 11, 12, 14, 17, 18, 19, 23, 24, 25, 27, 28],
    "hbs": [10, 12, 18, 29],
    "hb": [6, 10, 11, 12, 13, 14, 18, 24, 29],
    "ycbv": [1, 13, 14, 16, 18, 19, 20, 21],
    "ycbvposecnn": [13, 16, 19, 20, 21],
    "synthetic": [],
    "synthetic_sym": [1],
}


def _axis_angle_matrices(axis: np.ndarray, angles: np.ndarray) -> np.ndarray:
    """Rodrigues formula for a fixed unit axis and a vector of angles -> (K, 3, 3)."""
    axis = axis / np.linalg.norm(axis)
    kx, ky, kz = axis
    K = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]], dtype=np.float64)
    I = np.eye(3)
    sin = np.sin(angles)[:, None, None]
    cos = np.cos(angles)[:, None, None]
    return I[None] + sin * K[None] + (1.0 - cos) * (K @ K)[None]


def symmetry_pose_candidates(base_R: np.ndarray, base_t: np.ndarray, model_info: dict,
                             continuous_steps: int = 384) -> np.ndarray:
    """All GT-equivalent poses of a symmetric object: (K, 3, 4) float32.

    model_info uses BOP models_info.json keys: 'symmetries_discrete' (flat 4x4 lists)
    and/or 'symmetries_continuous' ([{'axis': [...], 'offset': [...]}]); continuous
    symmetry is discretized into `continuous_steps` rotations (reference symmetry.py:58-93).
    """
    continuous = 'symmetries_continuous' in model_info
    discrete = 'symmetries_discrete' in model_info
    if continuous and discrete:
        raise NotImplementedError("mixed discrete+continuous symmetries")
    if discrete:
        Rs = [np.eye(3)]
        ts = [np.zeros(3)]
        for sym in model_info['symmetries_discrete']:
            m = np.reshape(np.asarray(sym, dtype=np.float64), (4, 4))
            Rs.append(m[:3, :3])
            ts.append(m[:3, 3])
        xform_Rs = np.stack(Rs)
        xform_ts = np.stack(ts)
    elif continuous:
        syms = model_info['symmetries_continuous']
        assert len(syms) == 1, "only a single continuous symmetry supported"
        axis = np.asarray(syms[0]['axis'], dtype=np.float64)
        offset = np.asarray(syms[0]['offset'], dtype=np.float64)
        angles = np.linspace(0.0, 2.0 * math.pi, continuous_steps, endpoint=False)
        xform_Rs = _axis_angle_matrices(axis, angles)
        # rotation about an offset axis: x -> R(x - o) + o
        xform_ts = offset - xform_Rs @ offset
    else:
        xform_Rs = np.eye(3)[None]
        xform_ts = np.zeros((1, 3))

    candi_Rs = base_R @ xform_Rs
    candi_ts = (base_R @ xform_ts[..., None])[..., 0] + base_t
    return np.concatenate((candi_Rs, candi_ts[..., None]), axis=-1).astype(np.float32)


def pad_candidates(cands: np.ndarray, max_k: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad (K, 3, 4) candidates to (max_k, 3, 4) + validity mask (max_k,).

    Fixed shapes replace the reference's ragged sym_collate (dataset.py:351-365):
    padding repeats the first candidate so padded entries are valid poses that can
    never win the argmin by a margin (they tie with candidate 0).
    """
    k = cands.shape[0]
    if k > max_k:
        raise ValueError(f"{k} candidates exceed max_k={max_k}")
    pad = np.broadcast_to(cands[:1], (max_k - k, 3, 4))
    return (np.concatenate((cands, pad), axis=0),
            (np.arange(max_k) < k))


def select_pose_2d(cam_K: jax.Array, pts3d: jax.Array, pts2d: jax.Array,
                   pose_candi: jax.Array, candi_valid: jax.Array | None = None) -> jax.Array:
    """Pick, per batch element, the candidate pose whose reprojection of pts3d best
    matches pts2d (mean 2D error). Shapes: cam_K (B,3,3), pts3d (B,N,3), pts2d (B,N,2),
    pose_candi (B,K,3,4), candi_valid (B,K) bool. Returns (B,3,4)."""
    xf = pts3d[:, None] @ jnp.swapaxes(pose_candi[..., :3], -1, -2) \
        + pose_candi[..., None, :, 3]                        # (B,K,N,3)
    h = xf @ jnp.swapaxes(cam_K[:, None], -1, -2)
    uv = h[..., :2] / h[..., 2:3]
    err = jnp.mean(jnp.linalg.norm(uv - pts2d[:, None], axis=-1), axis=-1)  # (B,K)
    if candi_valid is not None:
        err = jnp.where(candi_valid, err, jnp.inf)
    best = jnp.argmin(err, axis=-1)
    return jnp.take_along_axis(pose_candi, best[:, None, None, None], axis=1)[:, 0]


def select_pose_3d(cam_K: jax.Array, pts3d_out: jax.Array, homo_z: jax.Array,
                   pose_candi: jax.Array, candi_valid: jax.Array | None = None) -> jax.Array:
    """Pick the candidate whose backprojected GT surface best matches the predicted
    model-frame points (mean 3D error). homo_z: (B,N,3) GT depth-scaled homogeneous
    pixels. Returns (B,3,4)."""
    inv_K = jnp.linalg.inv(cam_K)                            # (B,3,3)
    cam_pts = homo_z @ jnp.swapaxes(inv_K, -1, -2)           # (B,N,3)
    R = pose_candi[..., :3]                                   # (B,K,3,3)
    t = pose_candi[..., 3]                                    # (B,K,3)
    ref = (cam_pts[:, None] - t[..., None, :]) @ R            # (B,K,N,3) = Rᵀ(x - t), rows
    err = jnp.mean(jnp.linalg.norm(pts3d_out[:, None] - ref, axis=-1), axis=-1)
    if candi_valid is not None:
        err = jnp.where(candi_valid, err, jnp.inf)
    best = jnp.argmin(err, axis=-1)
    return jnp.take_along_axis(pose_candi, best[:, None, None, None], axis=1)[:, 0]
