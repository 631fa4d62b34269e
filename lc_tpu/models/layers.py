"""Shared NN building blocks (Flax linen, NHWC)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Mixed-precision policy: convolutions compute in bf16 on the MXU (params stay
# f32), every BatchNorm restores f32. lc_tpu/__init__ forces f32 matmul precision
# globally for the geometry/linalg path; the CNNs opt back into bf16 here.
COMPUTE_DTYPE = jnp.bfloat16


def set_compute_dtype(dtype):
    """Override the CNN compute dtype (tests use f32 for torch-parity checks)."""
    global COMPUTE_DTYPE
    COMPUTE_DTYPE = dtype


# torch-parity defaults: BN eps 1e-5, momentum 0.1 (flax momentum = 1 - torch = 0.9)
BatchNorm = functools.partial(nn.BatchNorm, momentum=0.9, epsilon=1e-5,
                              dtype=jnp.float32)


def Conv(*args, **kw):
    kw.setdefault('dtype', COMPUTE_DTYPE)
    return nn.Conv(*args, **kw)


def ConvTranspose(*args, **kw):
    kw.setdefault('dtype', COMPUTE_DTYPE)
    return nn.ConvTranspose(*args, **kw)

conv_init = nn.initializers.normal(stddev=0.001)  # reference mmcv normal_init std=.001


@functools.lru_cache(maxsize=32)
def _bilinear_matrix_np(n_in: int, n_out: int) -> np.ndarray:
    """Align-corners bilinear interpolation matrix (n_out, n_in).

    torch nn.UpsamplingBilinear2d uses align_corners=True; jax.image.resize does not
    offer it, so we materialize the (tiny, static) interpolation matrix and apply it
    as a matmul — which also lands on the MXU instead of a gather.
    """
    if n_in == 1:
        return np.ones((n_out, 1), np.float32)
    coords = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (coords - lo).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), lo] += 1.0 - frac
    m[np.arange(n_out), hi] += frac
    return m


def upsample_bilinear_align_corners(x: jax.Array, factor: int = 2) -> jax.Array:
    """NHWC bilinear upsample with align_corners=True (torch UpsamplingBilinear2d)."""
    B, H, W, C = x.shape
    mh = jnp.asarray(_bilinear_matrix_np(H, H * factor))
    mw = jnp.asarray(_bilinear_matrix_np(W, W * factor))
    x = jnp.einsum('oh,bhwc->bowc', mh, x)
    return jnp.einsum('ow,bhwc->bhoc', mw, x)


class Deconv2x(nn.Module):
    """Exact torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) equivalent.

    Built directly on lax.conv_general_dilated (input dilation 2, padding (1, 2),
    spatially-flipped kernel) because flax's ConvTranspose 'SAME' geometry does not
    line up with torch's — verified numerically in tests/test_models.py. The kernel
    parameter is stored (kh, kw, in, out) unflipped, so torch weights port with the
    same (2, 3, 0, 1) transpose as regular convs (torch convT weight is (in, out,
    kh, kw)); the flip happens at application time.
    """
    features: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param('kernel', conv_init,
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        dt = COMPUTE_DTYPE
        return jax.lax.conv_general_dilated(
            x.astype(dt), kernel[::-1, ::-1].astype(dt),
            window_strides=(1, 1), padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class ConvTransposeBNReLU(nn.Module):
    """Deconv 2x + BN + ReLU (torch ConvTranspose2d(k3, s2, p1, op1) parity)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = Deconv2x(self.features, name='deconv')(x)
        x = BatchNorm(use_running_average=not train, name='bn')(x)
        return nn.relu(x)


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(kernel=3, stride=2, padding=1) in NHWC."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
