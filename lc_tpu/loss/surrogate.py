"""Surrogate correspondence losses: binary-code BCE, segmentation, sparse NLL.

Channel-last layouts throughout; the binary-code histogram EMA is explicit state
returned to the caller (the reference keeps it as an nn.Module buffer,
losses.py:196-216).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def init_bin_histogram(total_bit_cnt: int, dtype=jnp.float32) -> jax.Array:
    return jnp.full((total_bit_cnt,), 0.5, dtype)


def xyz_bin_loss(noc_bin_logits: jax.Array, noc_bin_gt: jax.Array,
                 msk_vis_logits: jax.Array, histogram: jax.Array,
                 momentum: float = 0.05) -> tuple[jax.Array, jax.Array]:
    """ZebraPose binary-code loss with per-bit difficulty weighting.

    noc_bin_logits: (B, H, W, C) predicted Gray-code logits; noc_bin_gt: same shape,
    0/1 targets; msk_vis_logits: (B, H, W, 1). Bits that currently disagree with GT
    inside the mask drive an EMA histogram; softmax(3·min(h, 0.51−h)) re-weights the
    per-bit BCE (reference Loss_xyz_bin, losses.py:196-216). Returns (loss, new_hist).
    """
    msk_hard = msk_vis_logits > 0                        # (B, H, W, 1)
    hamm = jnp.logical_and(
        jnp.logical_xor(noc_bin_logits > 0, noc_bin_gt > 0.5), msk_hard)
    hist_obs = jnp.sum(hamm, axis=(0, 1, 2)) / (jnp.sum(msk_hard) + 1.0)
    new_hist = histogram * (1.0 - momentum) + hist_obs.astype(histogram.dtype) * momentum
    new_hist = jax.lax.stop_gradient(new_hist)

    hist_soft = jnp.minimum(new_hist, 0.51 - new_hist)
    bin_weights = jax.nn.softmax(hist_soft * 3.0)

    masked_logits = noc_bin_logits * msk_hard.astype(noc_bin_logits.dtype)
    raw = optax.sigmoid_binary_cross_entropy(masked_logits, noc_bin_gt)
    loss = jnp.sum(jnp.mean(raw, axis=(0, 1, 2)) * bin_weights)
    return loss, new_hist


def seg_bce_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, target))


def seg_l1_loss(logits: jax.Array, target: jax.Array,
                weight: jax.Array | None = None) -> jax.Array:
    """|sigmoid(logits) − target| (reference Loss_seg_L1, losses.py:219-236)."""
    err = jnp.abs(jax.nn.sigmoid(logits) - target)
    if weight is not None:
        err = err * weight
    return jnp.mean(err)


def sparse_kpt_nll_loss(pts2d: jax.Array, pts2d_std: jax.Array,
                        pts2d_proj: jax.Array) -> jax.Array:
    """Laplace NLL on keypoints: log σ + |err|/σ (reference losses.py:318-326)."""
    err = jnp.abs(pts2d - pts2d_proj)
    return jnp.mean(jnp.log(pts2d_std) + err / pts2d_std)
