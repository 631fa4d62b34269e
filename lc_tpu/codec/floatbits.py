"""ZebraPose-style Gray-code NOC codec ("floatbits"), pure jnp.

Semantics match reference floatbits.py: each NOC axis in (-1, 1) is quantized to
2^N bins, binary-expanded MSB-first, converted to Gray code ("mod bits"); with
black_background the two most significant Gray bits are flipped so an all-zero
(background) prediction decodes away from the object.

TPU-first differences from the reference:
  * channel-last layout everywhere: bits live on the trailing axis (the reference is
    NCHW with permutes at every boundary);
  * `black_background` is an explicit argument, not a process-global
    (reference floatbits.py:7-11);
  * Gray decoding is a cumulative XOR over a static ≤7-bit axis — no device LUTs
    (reference builds int LUT tensors per device, floatbits.py:189-254);
  * the straight-through decode-with-GT (reference
    mod_logits2float_with_gt_bb_scripted, floatbits.py:131-160) is a pure function of
    (logits, gt_bits, mask): all bits above the most-significant erroneous bit come
    from GT, that bit's logit passes through a sigmoid — the only gradient path.

bit_cnt is a static tuple of 3 ints (bits per NOC axis); total = sum(bit_cnt).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def calc_bit_count(sizes: Sequence[float], max_bits: int = 7, min_bits: int = 2) -> list[int]:
    """Bits per NOC axis from the object's per-axis extent (reference floatbits.py:257)."""
    max_size = max(sizes)
    return [max(min_bits, round(max_bits + math.log2(s / max_size))) for s in sizes]


def _axis_slices(bit_cnt: Sequence[int]):
    out, start = [], 0
    for n in bit_cnt:
        out.append(slice(start, start + n))
        start += n
    return out


def _weights(n: int, dtype=jnp.float32):
    """MSB-first bit weights [2^(n-1), ..., 1]."""
    return jnp.asarray([2 ** (n - 1 - i) for i in range(n)], dtype=dtype)


def _binary_to_gray(bits: jax.Array) -> jax.Array:
    """MSB-first binary -> Gray: g[0] = b[0], g[i] = b[i] ^ b[i-1]."""
    shifted = jnp.concatenate(
        (jnp.zeros_like(bits[..., :1]), bits[..., :-1]), axis=-1)
    return jnp.logical_xor(bits, shifted)


def _gray_to_binary(gray: jax.Array) -> jax.Array:
    """MSB-first Gray -> binary: b[i] = g[0] ^ ... ^ g[i]. Static unroll (n <= 7)."""
    n = gray.shape[-1]
    acc = gray[..., 0]
    cols = [acc]
    for i in range(1, n):
        acc = jnp.logical_xor(acc, gray[..., i])
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


def _flip_bb(bits: jax.Array, black_background: bool) -> jax.Array:
    if not black_background:
        return bits
    flipped = jnp.logical_not(bits[..., :2])
    return jnp.concatenate((flipped, bits[..., 2:]), axis=-1)


def noc_to_bits(noc: jax.Array, bit_cnt: Sequence[int], black_background: bool
                ) -> tuple[jax.Array, jax.Array]:
    """Encode NOC (..., 3) in (-1, 1) -> (mod_bits, raw_bits), each (..., sum(bit_cnt)) bool.

    mod_bits is the (optionally bb-flipped) Gray code the network learns to predict;
    raw_bits is the plain binary expansion used by the decode-with-GT path.
    """
    mod_parts, raw_parts = [], []
    for axis, n in enumerate(bit_cnt):
        max_num = 2 ** n - 1
        ints = jnp.clip(jnp.round((noc[..., axis] + 1.0) * (max_num * 0.5)), 0, max_num)
        ints = ints.astype(jnp.int32)
        shifts = jnp.asarray([n - 1 - i for i in range(n)], dtype=jnp.int32)
        shifts = jnp.broadcast_to(shifts, ints.shape + (n,))
        raw = (jax.lax.shift_right_logical(ints[..., None], shifts) & 1).astype(bool)
        mod_parts.append(_flip_bb(_binary_to_gray(raw), black_background))
        raw_parts.append(raw)
    return (jnp.concatenate(mod_parts, axis=-1),
            jnp.concatenate(raw_parts, axis=-1))


def bits_to_int(bits: jax.Array) -> jax.Array:
    """MSB-first bool bits (..., n) -> int32 (...)."""
    n = bits.shape[-1]
    w = jnp.asarray([2 ** (n - 1 - i) for i in range(n)], dtype=jnp.int32)
    return jnp.sum(bits.astype(jnp.int32) * w, axis=-1)


def _decode_axis_soft(logits: jax.Array, black_background: bool) -> jax.Array:
    """Inference decode of one axis: Gray logits (..., n) -> float value in [0, 2^n - 1].

    Integer part from hard Gray decoding; the LSB is replaced by a sigmoid of the last
    logit (sign-corrected so the value moves in the right direction), giving sub-bin
    resolution — matches reference mod_logits2float_bb (floatbits.py:195-223).
    """
    gray = _flip_bb(logits > 0, black_background)
    raw = _gray_to_binary(gray)
    val = bits_to_int(raw)
    lsb_factor = (1 - (val & 2)).astype(logits.dtype)  # ±1 based on bit 1
    # For n <= 2 the last Gray bit is inside the bb-flipped prefix, so its logit sign
    # is inverted in storage. The reference misses this (floatbits.py:222 reads the
    # raw logit) but also never produces n <= 2 in its configs; we decode correctly.
    if black_background and logits.shape[-1] <= 2:
        lsb_factor = -lsb_factor
    soft_lsb = jax.nn.sigmoid(logits[..., -1] * lsb_factor)
    return (val & -2).astype(logits.dtype) + soft_lsb


def logits_to_noc(logits: jax.Array, bit_cnt: Sequence[int], black_background: bool
                  ) -> jax.Array:
    """Inference decode: Gray logits (..., sum(bit_cnt)) -> NOC (..., 3) in (-1, 1)."""
    vals = []
    for sl, n in zip(_axis_slices(bit_cnt), bit_cnt):
        v = _decode_axis_soft(logits[..., sl], black_background)
        vals.append(v / ((2 ** n - 1) * 0.5) - 1.0)
    return jnp.stack(vals, axis=-1)


def _decode_axis_with_gt(logits: jax.Array, gt_raw_bits: jax.Array, gt_msk: jax.Array,
                         black_background: bool) -> jax.Array:
    """Training decode of one axis with the straight-through-at-MSB-error trick.

    logits: (..., n) Gray-code logits; gt_raw_bits: (..., n) bool plain binary;
    gt_msk: (...) bool (inside object). Returns float value in [0, 2^n - 1] whose only
    gradient path (inside the mask) is the sigmoid of the MSB-erroneous bit's logit.
    """
    n = logits.shape[-1]
    black_factor = -1.0 if black_background else 1.0
    # sign mask that converts Gray logits into binary-bit logits given GT context:
    # bit i's binary value is gray[i] ^ binary[i-1]; conditioned on GT binary[i-1],
    # the logit sign flips when gt_raw_bits[i-1] is set. First two carry the bb flip.
    prev_gt = jnp.concatenate(
        (jnp.zeros_like(gt_raw_bits[..., :1]), gt_raw_bits[..., :-1]), axis=-1)
    sign = jnp.where(prev_gt, -1.0, 1.0).astype(logits.dtype)
    bb = jnp.asarray([black_factor] * min(2, n) + [1.0] * max(0, n - 2),
                     dtype=logits.dtype)
    bin_logits = logits * sign * bb  # positive <=> predicted binary bit is 1

    pred_bits = bin_logits > 0
    w = _weights(n, logits.dtype)
    out_msk_vals = jnp.sum(pred_bits.astype(logits.dtype) * w, axis=-1)

    err = jnp.logical_xor(pred_bits, gt_raw_bits)
    err = err.at[..., -1].set(True)  # guarantee a hit; LSB always soft
    err_msb = jnp.argmax(err, axis=-1)  # first (most significant) erroneous bit

    onehot = jax.nn.one_hot(err_msb, n, dtype=logits.dtype)
    gt_wo_err = gt_raw_bits.astype(logits.dtype) * (1.0 - onehot)
    correct_part = jnp.sum(gt_wo_err * w, axis=-1)
    picked_logit = jnp.sum(bin_logits * onehot, axis=-1)
    picked_weight = jnp.sum(w * onehot, axis=-1)
    in_msk_vals = correct_part + jax.nn.sigmoid(picked_logit) * picked_weight

    return jnp.where(gt_msk, in_msk_vals, jax.lax.stop_gradient(out_msk_vals))


def logits_to_noc_with_gt(logits: jax.Array, gt_raw_bits: jax.Array,
                          bit_cnt: Sequence[int], gt_msk: jax.Array,
                          black_background: bool) -> jax.Array:
    """Training decode: (..., sum(bit_cnt)) logits + GT bits + mask -> NOC (..., 3)."""
    vals = []
    for sl, n in zip(_axis_slices(bit_cnt), bit_cnt):
        v = _decode_axis_with_gt(logits[..., sl], gt_raw_bits[..., sl], gt_msk,
                                 black_background)
        vals.append(v / ((2 ** n - 1) * 0.5) - 1.0)
    return jnp.stack(vals, axis=-1)


def noc_to_nn_target(noc: jax.Array, bit_cnt: Sequence[int], black_background: bool
                     ) -> tuple[jax.Array, jax.Array]:
    """GT NOC -> (training target mod_bits, raw_bits), both channel-last float/bool.

    Equivalent to reference nn_noc2target (floatbits.py:13) without the NCHW permutes.
    """
    mod_bits, raw_bits = noc_to_bits(noc, bit_cnt, black_background)
    return mod_bits.astype(jnp.float32), raw_bits
