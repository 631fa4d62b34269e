"""Device-side color augmentation pipeline (the imgaug replacement).

Mirrors the reference's imgaug pipeline distribution-for-distribution
(reference dataset.py:151-171): salt&pepper, motion blur, coarse dropout, gaussian
blur, additive brightness, invert, two multiplies, linear contrast — each gated by a
per-sample Bernoulli, with the same probabilities and value ranges. Operates on
float RGB in [0, 255], (B, H, W, 3), fully inside jit (one fused XLA program per
batch instead of per-worker Python loops).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gate(key, b, prob):
    return jax.random.bernoulli(key, prob, (b, 1, 1, 1))


def _maybe_per_channel(key, b, prob_pc, low, high):
    """Sample (B,1,1,3) values; with prob prob_pc per-channel, else shared."""
    k1, k2, k3 = jax.random.split(key, 3)
    per = jax.random.uniform(k1, (b, 1, 1, 3), minval=low, maxval=high)
    shared = jax.random.uniform(k2, (b, 1, 1, 1), minval=low, maxval=high)
    pc = jax.random.bernoulli(k3, prob_pc, (b, 1, 1, 1))
    return jnp.where(pc, per, jnp.broadcast_to(shared, per.shape))


def _gaussian_blur(x, sigma):
    """5-tap separable gaussian with per-sample sigma (B,1,1,1); sigma→0 ≈ identity."""
    offs = jnp.arange(-2.0, 3.0)
    s = jnp.maximum(sigma[:, 0, 0, 0], 1e-3)                    # (B,)
    w = jnp.exp(-0.5 * (offs[None, :] / s[:, None]) ** 2)       # (B, 5)
    w = w / jnp.sum(w, axis=-1, keepdims=True)

    def blur_one(img, wk):
        pad = jnp.pad(img, ((2, 2), (0, 0), (0, 0)), mode='edge')
        v = sum(wk[i] * pad[i:i + img.shape[0]] for i in range(5))
        pad = jnp.pad(v, ((0, 0), (2, 2), (0, 0)), mode='edge')
        return sum(wk[i] * pad[:, i:i + img.shape[1]] for i in range(5))

    return jax.vmap(blur_one)(x, w)


def _motion_blur(x, key):
    """5-tap line blur at a random one of 4 directions per sample."""
    B, H, W, C = x.shape
    direction = jax.random.randint(key, (B,), 0, 4)
    pad = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode='edge')

    def shifted(dy, dx):
        return jax.lax.dynamic_slice(
            pad, (0, 2 + dy, 2 + dx, 0), (B, H, W, C))

    dirs = [(0, 1), (1, 0), (1, 1), (1, -1)]  # horizontal, vertical, 2 diagonals
    outs = []
    for dy, dx in dirs:
        acc = sum(shifted(dy * o, dx * o) for o in (-2, -1, 0, 1, 2)) / 5.0
        outs.append(acc)
    stacked = jnp.stack(outs)                                   # (4, B, H, W, C)
    return jnp.take_along_axis(
        stacked, direction[None, :, None, None, None], axis=0)[0]


def _coarse_dropout(x, key, p=0.1, size_percent=0.05):
    B, H, W, C = x.shape
    gh = max(int(H * size_percent), 1)
    gw = max(int(W * size_percent), 1)
    keep = jax.random.bernoulli(key, 1.0 - p, (B, gh, gw, 1)).astype(x.dtype)
    keep = jnp.repeat(jnp.repeat(keep, -(-H // gh), axis=1)[:, :H],
                      -(-W // gw), axis=2)[:, :, :W]
    return x * keep


def _salt_and_pepper(x, key, p=0.05):
    k1, k2 = jax.random.split(key)
    hit = jax.random.bernoulli(k1, p, x.shape[:3] + (1,))
    salt = jax.random.bernoulli(k2, 0.5, x.shape[:3] + (1,))
    sp = jnp.where(salt, 255.0, 0.0)
    return jnp.where(hit, sp, x)


@functools.partial(jax.jit, static_argnames=('use_pepper_salt', 'use_motion_blur',
                                             'use_invert'))
def color_augment(x: jax.Array, key: jax.Array, *, use_pepper_salt: bool = False,
                  use_motion_blur: bool = False, use_invert: bool = False
                  ) -> jax.Array:
    """Apply the full pipeline. x: (B, H, W, 3) float in [0, 255]."""
    B = x.shape[0]
    keys = jax.random.split(key, 24)
    ki = iter(range(24))

    if use_pepper_salt:
        g = _gate(keys[next(ki)], B, 0.3)
        x = jnp.where(g, _salt_and_pepper(x, keys[next(ki)]), x)
    if use_motion_blur:
        g = _gate(keys[next(ki)], B, 0.2)
        x = jnp.where(g, _motion_blur(x, keys[next(ki)]), x)

    g = _gate(keys[next(ki)], B, 0.5)
    x = jnp.where(g, _coarse_dropout(x, keys[next(ki)]), x)

    g = _gate(keys[next(ki)], B, 0.5)
    sigma = jax.random.uniform(keys[next(ki)], (B, 1, 1, 1), maxval=1.2)
    x = jnp.where(g, _gaussian_blur(x, sigma), x)

    g = _gate(keys[next(ki)], B, 0.5)
    add = _maybe_per_channel(keys[next(ki)], B, 0.3, -25.0, 25.0)
    x = jnp.where(g, x + add, x)

    if use_invert:
        g = _gate(keys[next(ki)], B, 0.4)
        inv = jax.random.bernoulli(keys[next(ki)], 0.2, (B, 1, 1, 3))
        x = jnp.where(g & inv, 255.0 - x, x)

    g = _gate(keys[next(ki)], B, 0.5)
    mul = _maybe_per_channel(keys[next(ki)], B, 0.5, 0.6, 1.4)
    x = jnp.where(g, x * mul, x)

    g = _gate(keys[next(ki)], B, 0.5)
    mul2 = jax.random.uniform(keys[next(ki)], (B, 1, 1, 1), minval=0.6, maxval=1.4)
    x = jnp.where(g, x * mul2, x)

    g = _gate(keys[next(ki)], B, 0.5)
    alpha = _maybe_per_channel(keys[next(ki)], B, 0.3, 0.5, 2.2)
    x = jnp.where(g, 127.0 + alpha * (x - 127.0), x)

    return jnp.clip(x, 0.0, 255.0)


def switch_background(rgb: jax.Array, fg_mask: jax.Array, bg: jax.Array,
                      enable: jax.Array) -> jax.Array:
    """Composite crops over new backgrounds where enable[b] (reference
    dataset.py:137-148). rgb, bg: (B, h, w, 3); fg_mask: (B, h, w); enable: (B,)."""
    m = fg_mask[..., None]
    composed = rgb * m + bg * (1.0 - m)
    return jnp.where(enable[:, None, None, None], composed, rgb)
