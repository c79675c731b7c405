import numpy as np
import jax.numpy as jnp
import pytest

from lss_carla_tpu.ops import image as I

from reference_impl import torch_bilinear_align_corners


@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 22), (16, 44)),    # Up x2 in CamEncode
    ((25, 25), (100, 100)),  # Up x4 in BevEncode
    ((100, 100), (200, 200)),
    ((5, 7), (13, 3)),       # odd sizes incl. downscale
    ((1, 4), (3, 8)),        # degenerate single row
])
def test_bilinear_align_corners_matches_torch(rng, in_hw, out_hw):
    x = rng.normal(size=(2, *in_hw, 3)).astype(np.float32)
    got = np.asarray(I.resize_bilinear_align_corners(jnp.asarray(x), out_hw))
    want = torch_bilinear_align_corners(x, out_hw)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_upsample_scale2(rng):
    x = rng.normal(size=(1, 4, 6, 2)).astype(np.float32)
    got = np.asarray(I.upsample_align_corners(jnp.asarray(x), 2))
    want = torch_bilinear_align_corners(x, (8, 12))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_normalize_denormalize_roundtrip(rng):
    img = rng.integers(0, 256, size=(4, 6, 3)).astype(np.uint8)
    x = I.normalize_img(img)
    assert x.dtype == np.float32
    back = I.denormalize_img(x)
    np.testing.assert_allclose(back, img.astype(np.float32) / 255.0, atol=1e-5)


def test_normalize_matches_imagenet_stats():
    img = np.full((2, 2, 3), 255, dtype=np.uint8)
    x = I.normalize_img(img)
    want = (1.0 - I.IMAGENET_MEAN) / I.IMAGENET_STD
    np.testing.assert_allclose(x[0, 0], want, rtol=1e-6)
