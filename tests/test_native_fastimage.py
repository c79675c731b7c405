"""Native JPEG pipeline: build, PIL parity, loader integration, fallback."""

import io

import numpy as np
import pytest
from PIL import Image

from lss_carla_tpu.native import (decode_crop_normalize, fastimage_available,
                                  jpeg_dims)
from lss_carla_tpu.ops.image import normalize_img

pytestmark = pytest.mark.skipif(not fastimage_available(),
                                reason="native toolchain unavailable")


def _jpeg_bytes(rng, W=480, H=224):
    arr = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def test_jpeg_dims(rng):
    data = _jpeg_bytes(rng)
    assert jpeg_dims(data) == (480, 224)


def test_decode_crop_normalize_matches_pil(rng):
    data = _jpeg_bytes(rng)
    crop = (64, 96, 416, 224)  # the SimBEV default-config crop
    got = decode_crop_normalize(data, crop)
    # PIL path: decode, crop, normalize
    pil = Image.open(io.BytesIO(data)).crop(crop)
    want = normalize_img(np.asarray(pil.convert("RGB"))).transpose(2, 0, 1)
    assert got.shape == want.shape == (3, 128, 352)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bad_crop_raises(rng):
    data = _jpeg_bytes(rng)
    with pytest.raises(ValueError):
        decode_crop_normalize(data, (0, 0, 481, 224))  # 1px too wide


def test_bad_jpeg_raises():
    with pytest.raises(ValueError):
        decode_crop_normalize(b"not a jpeg at all", (0, 0, 8, 8))


def test_dataset_native_matches_pil_path(tmp_path, rng):
    from lss_carla_tpu.configs import DataAugConf, GridConf
    from lss_carla_tpu.data.fixtures import generate_fixture
    from lss_carla_tpu.data.simbev import SegmentationData

    root = generate_fixture(tmp_path, num_scenes=2, samples_per_scene=1,
                            H=224, W=480)
    aug = DataAugConf()  # default: pure-crop pipeline -> native eligible
    ds_native = SegmentationData(root, is_train=False, data_aug_conf=aug,
                                 grid_conf=GridConf(), use_native=True)
    ds_pil = SegmentationData(root, is_train=False, data_aug_conf=aug,
                              grid_conf=GridConf(), use_native=False)
    assert ds_native._native
    a = ds_native[0]
    b = ds_pil[0]
    np.testing.assert_allclose(a[0], b[0], atol=1e-5)  # images identical
    for x, y in zip(a[1:], b[1:]):
        np.testing.assert_array_equal(x, y)
