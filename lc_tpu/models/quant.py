"""Post-training int8 quantization for the CNN inference path.

TPU v5e's MXU runs int8 matmuls/convolutions at 2x its bf16 peak
(394 vs 197 TOPS), and both flagship families are forward-bound at
inference (BASELINE.md: the Zebra DeepLabV3 forward alone is 72% of its
batch budget at 80% bf16 MFU — at the bf16 roofline, int8 is the only
remaining accuracy-preserving throughput lever). This module quantizes
the convolution stack WITHOUT touching any model definition or
checkpoint: a `flax.linen.intercept_methods` context rewrites every
`nn.Conv` / `Deconv2x` application into

    w_q  = round(w / s_w)        per-OUTPUT-CHANNEL symmetric int8 weights
    x_q  = round(x / s_x)        per-SAMPLE dynamic symmetric int8 activations
    y    = conv(x_q, w_q) -> int32 accumulate on the MXU
    out  = y * (s_x * s_w) + bias

so the f32 checkpoint stays the single source of truth (weights quantize
inside the jitted forward — a cheap elementwise pass XLA overlaps with
the convs) and turning the mode on is one context manager around
`model.apply`. Dynamic activation scales need no calibration data: the
scale is `max|x|/127` of the live tensor per SAMPLE (reduced over H,W,C
with the batch axis kept), one VPU reduction per conv — so eval results
are independent of batch composition, exactly like the per-sample f32
reference path.

This has no reference counterpart (the reference runs f32 CUDA end to
end, reference test.py:164); it is gated off by default and enabled by
`int8_inference: true` / `--opts int8_inference=true` on the test CLI,
or `quantized_int8()` around any apply. The space-to-depth stem conv
(models/resnet._StemConvS2D, ~1.5% of CDPN FLOPs) and the Dense
weight-scale head stay in bf16/f32. Accuracy is pinned by
tests/test_quant.py: exactness on int8-representable weights (catches
plumbing bugs), tolerance vs the f32 forward on random CDPN/Zebra
models, and end-to-end pose agreement through the solver chain.
"""
from __future__ import annotations

import contextlib
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Deconv2x


def _canon_pairs(v, n=2):
    """flax Conv padding/stride canonicalization for the forms this repo uses:
    int -> ((v, v),) * n; sequence of ints -> per-dim (p, p); sequence of
    pairs -> as-is; strings ('SAME'/'VALID') pass through to lax."""
    if isinstance(v, str):
        return v
    if isinstance(v, int):
        return ((v, v),) * n
    out = []
    for e in v:
        out.append((e, e) if isinstance(e, int) else tuple(e))
    return tuple(out)


def _canon_tuple(v, n=2):
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def quantize_tensor(x: jax.Array, axes=None,
                    keepdims: bool = False) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization. Returns (q (int8), scale (f32)).

    axes=None: one per-tensor scale. axes=(0,1,2): per-channel over the last
    dim (conv kernels). axes=(1,2,3), keepdims=True: per-SAMPLE over an NHWC
    activation — each batch row gets its own scale, so a sample's quantized
    output is independent of its batchmates (matching the deterministic
    per-sample f32 reference path; a partial final eval batch scores
    identically to the same images in a full batch). Scale = max|x|/127,
    floored to avoid 0/0 on dead channels."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf)) if axes is None else \
        jnp.max(jnp.abs(xf), axis=axes, keepdims=keepdims)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quantize_act(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-sample dynamic activation quantization (NHWC: reduce H,W,C only)."""
    return quantize_tensor(x, axes=tuple(range(1, x.ndim)), keepdims=True)


def _int8_conv(m: nn.Conv, x: jax.Array) -> jax.Array:
    """Quantized replacement for nn.Conv.__call__ (NHWC, no feature groups)."""
    params = m.variables['params']
    w = params['kernel']                                  # (kh, kw, cin, cout)
    wq, ws = quantize_tensor(w, axes=(0, 1, 2))           # ws (cout,)
    xq, xs = _quantize_act(x)                             # xs (B, 1, 1, 1)
    y = jax.lax.conv_general_dilated(
        xq, wq,
        window_strides=_canon_tuple(m.strides),
        padding=_canon_pairs(m.padding),
        rhs_dilation=_canon_tuple(m.kernel_dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (xs * ws)
    if m.use_bias:
        out = out + params['bias']
    return out.astype(m.dtype or x.dtype)


def _int8_deconv(m: Deconv2x, x: jax.Array) -> jax.Array:
    """Quantized Deconv2x: same flipped-kernel input-dilated conv geometry as
    layers.Deconv2x.__call__ (the zero rows lhs_dilation inserts are exactly
    representable, so dequantization is unchanged)."""
    w = m.variables['params']['kernel']                   # (3, 3, cin, cout)
    wq, ws = quantize_tensor(w, axes=(0, 1, 2))
    xq, xs = _quantize_act(x)                             # xs (B, 1, 1, 1)
    y = jax.lax.conv_general_dilated(
        xq, wq[::-1, ::-1],
        window_strides=(1, 1), padding=((1, 2), (1, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    from .layers import COMPUTE_DTYPE
    return (y.astype(jnp.float32) * (xs * ws)).astype(COMPUTE_DTYPE)


def _is_default_dilation(v) -> bool:
    if v is None:
        return True
    return all(e == 1 for e in _canon_tuple(v))


def _make_interceptor(skip: Callable[[nn.Module], bool] | None):
    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if (context.method_name == '__call__' and not m.is_initializing()
                and (skip is None or not skip(m))):
            # _int8_conv reproduces only the geometry the shipped models use:
            # no feature groups, no input dilation, no kernel mask. Anything
            # else falls through to the f32/bf16 path rather than quantizing
            # with silently-wrong geometry.
            if (type(m) is nn.Conv and m.feature_group_count == 1
                    and m.mask is None
                    and _is_default_dilation(m.input_dilation)):
                return _int8_conv(m, *args, **kwargs)
            if type(m) is Deconv2x:
                return _int8_deconv(m, *args, **kwargs)
        return next_fun(*args, **kwargs)
    return interceptor


@contextlib.contextmanager
def quantized_int8(skip: Callable[[nn.Module], bool] | None = None):
    """Run every model.apply inside this context with int8 convolutions.

    skip: optional predicate on the bound module — return True to keep that
    conv in bf16/f32 (e.g. `lambda m: m.name == 'out_layer'` pins the output
    head; measured unnecessary for the shipped families, see tests)."""
    with nn.intercept_methods(_make_interceptor(skip)):
        yield
