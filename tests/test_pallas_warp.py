import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lc_tpu.ops import pallas_warp as pw
from lc_tpu.geom.affine import crop_affine

RNG = np.random.default_rng(21)


def smooth_image(B, H, W, C=3):
    """Low-frequency test image (resampling differences stay small)."""
    small = RNG.uniform(0, 255, (B, H // 8, W // 8, C)).astype(np.float32)
    return np.asarray(jax.image.resize(jnp.asarray(small), (B, H, W, C),
                                       'bilinear'))


class TestShearX:
    def test_reference_integer_shift(self):
        img = jnp.asarray(RNG.uniform(0, 1, (1, 4, 8, 1)).astype(np.float32))
        shifts = jnp.full((1, 4), 2.0)
        out = np.asarray(pw.shear_x_reference(img, shifts))
        np.testing.assert_allclose(out[0, :, :6, 0], np.asarray(img)[0, :, 2:, 0],
                                   atol=1e-6)
        np.testing.assert_allclose(out[0, :, 6:, 0], 0.0, atol=1e-6)

    def test_reference_fractional(self):
        img = jnp.asarray(np.arange(8, dtype=np.float32)[None, None, :, None]
                          .repeat(2, 1))
        out = np.asarray(pw.shear_x_reference(img, jnp.full((1, 2), 0.5)))
        np.testing.assert_allclose(out[0, 0, :7, 0], np.arange(7) + 0.5,
                                   atol=1e-5)

    def test_pallas_matches_reference(self):
        img = jnp.asarray(RNG.uniform(0, 255, (2, 8, 16, 3)).astype(np.float32))
        shifts = jnp.asarray(RNG.uniform(-3, 3, (2, 8)).astype(np.float32))
        ref = np.asarray(pw.shear_x_reference(img, shifts))
        out = np.asarray(pw.shear_x_pallas(img, shifts, interpret=True))
        np.testing.assert_allclose(out, ref, atol=5e-4)


class TestRotatedCropWarp:
    @pytest.mark.parametrize('rot', [0.0, 0.3, -0.6, 1.2, 2.5, 3.5, 5.0])
    def test_matches_cv2(self, rot):
        import cv2
        B, H, W = 2, 240, 320
        img = smooth_image(B, H, W)
        center = np.array([[160.0, 120.0], [150.0, 130.0]], np.float32)
        scale = np.array([140.0, 120.0], np.float32)
        out_wh = (64, 64)
        got = np.asarray(pw.rotated_crop_warp(
            jnp.asarray(img), jnp.asarray(center), jnp.asarray(scale),
            jnp.full((B,), rot, jnp.float32), out_wh, use_pallas=False))
        for b in range(B):
            aff = crop_affine(center[b], scale[b], rot, out_wh)
            ref = cv2.warpAffine(img[b], aff.astype(np.float32), out_wh,
                                 flags=cv2.INTER_LINEAR)
            # interior comparison: two-stage resampling vs direct differs most at
            # zero-padding borders
            inter = (slice(8, -8), slice(8, -8))
            err = np.abs(got[b][inter] - ref[inter])
            assert np.quantile(err, 0.95) < 12.0, (rot, b, err.max())
            assert err.mean() < 4.0, (rot, b, err.mean())
