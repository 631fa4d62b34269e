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

Dynamic scales have a bandwidth cost the MXU rate cannot hide: the amax
reduction must complete before the quantized rewrite of the SAME tensor,
so every conv input makes two extra HBM passes (write wide + re-read +
write int8) that a fused bf16 conv never pays. `calibrate_act_scales`
measures per-conv static scales on calibration batches instead;
`quantized_int8(act_scales=...)` then quantizes with fixed scalars — a
pure elementwise op XLA fuses into the producing BN/ReLU, so activations
are written ONCE, as int8 (less traffic than the bf16 path, not more).
Static scales are per-conv per-tensor (shared across samples), the
standard post-training-quantization operating point.

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


# Sentinel for `quantized_int8(act_scales=...)`: every conv uses one fixed
# nominal scale instead of calibrated values. TIMING/LOWERING USE ONLY — the
# compiled program is identical in structure and cost to a calibrated run, but
# the outputs are numerically meaningless. For real inference pass the dict
# from `calibrate_act_scales`.
STATIC_SCALE_ANY = "__static_scale_any__"
_NOMINAL_SCALE = 0.05


def _quantize_act_static(x: jax.Array, scale) -> tuple[jax.Array, jax.Array]:
    """Fixed-scale activation quantization: a pure elementwise pass (no
    reduction barrier), so XLA fuses it into the producing BN/ReLU and the
    activation materializes in HBM once, as int8."""
    s = jnp.asarray(scale, jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def _act_scale_for(m: nn.Module, act_scales):
    """None -> dynamic; sentinel -> nominal fixed; dict -> calibrated lookup
    by module path (missing paths fall back to dynamic)."""
    if act_scales is None:
        return None
    if act_scales is STATIC_SCALE_ANY:
        return _NOMINAL_SCALE
    return act_scales.get('/'.join(m.path))


def _int8_conv(m: nn.Conv, x: jax.Array, act_scale=None) -> jax.Array:
    """Quantized replacement for nn.Conv.__call__ (NHWC, no feature groups)."""
    params = m.variables['params']
    w = params['kernel']                                  # (kh, kw, cin, cout)
    wq, ws = quantize_tensor(w, axes=(0, 1, 2))           # ws (cout,)
    if act_scale is None:
        xq, xs = _quantize_act(x)                         # xs (B, 1, 1, 1)
    else:
        xq, xs = _quantize_act_static(x, act_scale)
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


def _int8_deconv(m: Deconv2x, x: jax.Array, act_scale=None) -> jax.Array:
    """Quantized Deconv2x: same flipped-kernel input-dilated conv geometry as
    layers.Deconv2x.__call__ (the zero rows lhs_dilation inserts are exactly
    representable, so dequantization is unchanged)."""
    w = m.variables['params']['kernel']                   # (3, 3, cin, cout)
    wq, ws = quantize_tensor(w, axes=(0, 1, 2))
    if act_scale is None:
        xq, xs = _quantize_act(x)                         # xs (B, 1, 1, 1)
    else:
        xq, xs = _quantize_act_static(x, act_scale)
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


def _quantizable(m: nn.Module) -> bool:
    """_int8_conv reproduces only the geometry the shipped models use: no
    feature groups, no input dilation, no kernel mask. Anything else falls
    through to the f32/bf16 path rather than quantizing with silently-wrong
    geometry."""
    if type(m) is nn.Conv:
        return (m.feature_group_count == 1 and m.mask is None
                and _is_default_dilation(m.input_dilation))
    return type(m) is Deconv2x


def _make_interceptor(skip: Callable[[nn.Module], bool] | None,
                      act_scales=None):
    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if (context.method_name == '__call__' and not m.is_initializing()
                and (skip is None or not skip(m)) and _quantizable(m)):
            scale = _act_scale_for(m, act_scales)
            if type(m) is nn.Conv:
                return _int8_conv(m, *args, act_scale=scale, **kwargs)
            return _int8_deconv(m, *args, act_scale=scale, **kwargs)
        return next_fun(*args, **kwargs)
    return interceptor


@contextlib.contextmanager
def quantized_int8(skip: Callable[[nn.Module], bool] | None = None,
                   act_scales=None):
    """Run every model.apply inside this context with int8 convolutions.

    skip: optional predicate on the bound module — return True to keep that
    conv in bf16/f32 (e.g. `lambda m: m.name == 'out_layer'` pins the output
    head; measured unnecessary for the shipped families, see tests).

    act_scales: None (default) uses dynamic per-sample activation scales —
    calibration-free, batch-composition-independent, but two extra HBM passes
    per conv input (the amax reduction must finish before the quantized
    rewrite of the same tensor). A dict from `calibrate_act_scales` uses
    fixed per-conv scales — the quantize becomes elementwise and fuses into
    the producer, removing those passes (convs whose path is missing from the
    dict fall back to dynamic). STATIC_SCALE_ANY is a timing-only sentinel."""
    with nn.intercept_methods(_make_interceptor(skip, act_scales)):
        yield


def calibrate_act_scales(apply_fn: Callable[[jax.Array], object],
                         batches,
                         skip: Callable[[nn.Module], bool] | None = None
                         ) -> dict[str, jax.Array]:
    """Measure static per-conv activation scales for `quantized_int8`.

    Runs `apply_fn(batch)` (an UNJITTED wrapper that calls model.apply — the
    recording interceptor must be live at trace time) for each calibration
    batch inside ONE jitted recording program (eager op-by-op execution would
    pay a dispatch/compile round-trip per op on remote backends), recording
    every quantizable conv's max|input|; returns {module_path: amax/127}
    keyed exactly as the quantizing interceptor looks them up.

    Calibration runs WITH dynamic int8 quantization in the loop: each conv
    records its input's amax and then executes quantized, so deeper convs see
    the activation distribution the quantized network actually produces at
    serving time (a plain-f32 calibration pass systematically mis-scales deep
    layers, whose inputs shift once their predecessors quantize). This also
    makes the mode exactly reproducible: at batch 1, static scales calibrated
    on a sample make the static forward BIT-EQUAL to the dynamic forward on
    that sample (pinned in tests/test_quant.py). Scale choice is plain
    max-calibration — with per-OUTPUT-CHANNEL weight scales on top, the conv
    result keeps per-channel resolution; the accuracy delta vs dynamic scales
    is measured on trained checkpoints in BASELINE.md."""
    rec: dict[str, jax.Array] = {}

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if (context.method_name == '__call__' and not m.is_initializing()
                and (skip is None or not skip(m)) and _quantizable(m)):
            x = args[0]
            key = '/'.join(m.path)
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
            rec[key] = jnp.maximum(rec[key], amax) if key in rec else amax
            if type(m) is nn.Conv:
                return _int8_conv(m, *args, **kwargs)
            return _int8_deconv(m, *args, **kwargs)
        return next_fun(*args, **kwargs)

    @jax.jit
    def record(b):
        # trace-time: the interceptor fills `rec` with tracers; returning a
        # dict snapshot turns them into compiled outputs. Repeat calls at the
        # same shape reuse the compiled program (rec is only mutated during
        # the one trace, which is exactly when the snapshot is taken).
        rec.clear()
        with nn.intercept_methods(interceptor):
            apply_fn(b)
        return dict(rec)

    acc: dict[str, jax.Array] = {}
    for b in batches:
        for k, v in record(b).items():
            acc[k] = jnp.maximum(acc[k], v) if k in acc else v
    return {k: jnp.maximum(jnp.asarray(v), 1e-12) / 127.0
            for k, v in acc.items()}
