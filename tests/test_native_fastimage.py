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


def test_decode_resize_crop_matches_pil(rng):
    """The fused resize kernel follows PIL's default bicubic to within the
    1/255 PIL-intermediate-quantization rounding, incl. flip."""
    from lss_carla_tpu.native import decode_resize_crop_u8
    data = _jpeg_bytes(rng)
    for resize, flip in [(0.7333333333333333, False), (0.85, True),
                         (1.0, True)]:
        rw, rh = int(480 * resize), int(224 * resize)
        fW, fH = min(352, rw), min(128, rh)
        crop = ((rw - fW) // 2, rh - fH, (rw - fW) // 2 + fW, rh)
        pil = Image.open(io.BytesIO(data)).resize((rw, rh)).crop(crop)
        if flip:
            pil = pil.transpose(method=Image.FLIP_LEFT_RIGHT)
        want = np.asarray(pil.convert("RGB")).transpose(2, 0, 1)
        got = decode_resize_crop_u8(data, (rw, rh), crop, flip)
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1, (resize, flip, diff.max())


# normalized-space tolerance for a 1/255 pixel difference (std ~0.225)
_ATOL_1PX = 2.0 / 255.0 / 0.224


def test_dataset_native_matches_pil_path(tmp_path, rng):
    """Val pipeline (resize 0.733 + center crop): native vs PIL loaders
    agree to within resample rounding; all geometry outputs are identical."""
    from lss_carla_tpu.configs import DataAugConf, GridConf
    from lss_carla_tpu.data.fixtures import generate_fixture
    from lss_carla_tpu.data.simbev import SegmentationData

    root = generate_fixture(tmp_path, num_scenes=2, samples_per_scene=1,
                            H=224, W=480)
    aug = DataAugConf()
    ds_native = SegmentationData(root, is_train=False, data_aug_conf=aug,
                                 grid_conf=GridConf(), use_native=True)
    ds_pil = SegmentationData(root, is_train=False, data_aug_conf=aug,
                              grid_conf=GridConf(), use_native=False)
    assert ds_native._native
    a = ds_native[0]
    b = ds_pil[0]
    np.testing.assert_allclose(a[0], b[0], atol=_ATOL_1PX)
    for x, y in zip(a[1:], b[1:]):
        np.testing.assert_array_equal(x, y)


def test_dataset_native_matches_pil_path_train_aug(tmp_path, rng):
    """Augmented train pipeline (random resize + crop + flip): same aug
    draw (seeded) through native and PIL paths agrees incl. homography."""
    from lss_carla_tpu.configs import DataAugConf, GridConf
    from lss_carla_tpu.data.fixtures import generate_fixture
    from lss_carla_tpu.data.simbev import SegmentationData

    root = generate_fixture(tmp_path, num_scenes=2, samples_per_scene=1,
                            H=224, W=480)
    aug = DataAugConf(resize_lim=(0.70, 0.85), rand_flip=True)
    ds_native = SegmentationData(root, is_train=True, data_aug_conf=aug,
                                 grid_conf=GridConf(), use_native=True)
    ds_pil = SegmentationData(root, is_train=True, data_aug_conf=aug,
                              grid_conf=GridConf(), use_native=False)
    for seed in (0, 1, 2):
        np.random.seed(seed)
        a = ds_native[0]
        np.random.seed(seed)
        b = ds_pil[0]
        np.testing.assert_allclose(a[0], b[0], atol=_ATOL_1PX)
        for x, y in zip(a[1:], b[1:]):
            np.testing.assert_array_equal(x, y)


def test_dataset_native_rotation_falls_back(tmp_path, rng):
    """Arbitrary-angle rotation is PIL-only: both paths must still agree
    exactly (the native dataset falls back for rotate != 0)."""
    from lss_carla_tpu.configs import DataAugConf, GridConf
    from lss_carla_tpu.data.fixtures import generate_fixture
    from lss_carla_tpu.data.simbev import SegmentationData

    root = generate_fixture(tmp_path, num_scenes=2, samples_per_scene=1,
                            H=224, W=480)
    aug = DataAugConf(rot_lim=(3.0, 5.0))
    ds_native = SegmentationData(root, is_train=True, data_aug_conf=aug,
                                 grid_conf=GridConf(), use_native=True)
    ds_pil = SegmentationData(root, is_train=True, data_aug_conf=aug,
                              grid_conf=GridConf(), use_native=False)
    np.random.seed(7)
    a = ds_native[0]
    np.random.seed(7)
    b = ds_pil[0]
    np.testing.assert_allclose(a[0], b[0], atol=1e-6)


def test_expected_dims_mismatch_raises(rng):
    """Crop-only kernel must reject files whose decoded size differs from
    the configured dims (rc 3) — those need a resize first, and silently
    cropping the unresized image would train on wrong pixels."""
    from lss_carla_tpu.native import decode_crop_u8
    data = _jpeg_bytes(rng, W=960, H=448)  # 2x the configured size
    crop = (64, 96, 416, 224)
    with pytest.raises(ValueError, match="rc=3"):
        decode_crop_normalize(data, crop, expected_dims=(480, 224))
    with pytest.raises(ValueError, match="rc=3"):
        decode_crop_u8(data, crop, expected_dims=(480, 224))
    # matching dims still succeed
    ok = decode_crop_normalize(_jpeg_bytes(rng), crop,
                               expected_dims=(480, 224))
    assert ok.shape == (3, 128, 352)


def test_degenerate_crop_raises_not_crashes(rng):
    """Zero-area crops must error (rc 2), not under/overflow buffers."""
    from lss_carla_tpu.native import (decode_crop_u8, decode_resize_crop_u8)
    data = _jpeg_bytes(rng)
    for bad in [(10, 10, 10, 50), (10, 10, 50, 10)]:  # zero w / zero h
        with pytest.raises(ValueError):
            decode_crop_u8(data, bad)
        with pytest.raises(ValueError):
            decode_resize_crop_u8(data, (480, 224), bad)


def test_truncated_jpeg_is_lenient_like_pil(rng):
    """A valid header with a truncated body DECODES (libjpeg's memory
    source inserts a fake EOI and pads — a warning, not error_exit), same
    as PIL with LOAD_TRUNCATED_IMAGES. The fatal longjmp path (covered by
    test_bad_jpeg_raises) only fires on undecodable headers/markers."""
    from lss_carla_tpu.native import decode_resize_crop_u8
    data = _jpeg_bytes(rng)
    truncated = data[: len(data) // 3]
    out = decode_resize_crop_u8(truncated, (400, 200), (0, 0, 100, 50))
    assert out.shape == (3, 50, 100)


def test_out_of_bounds_crop_matches_pil_zero_padding(rng):
    """PIL's crop() zero-pads beyond the resized image; the fused kernel
    must match — this is the documented scale-robust recipe's path
    (resize_lim dipping below final_dim/dims makes crops overhang)."""
    from lss_carla_tpu.native import (decode_resize_crop_normalize,
                                      decode_resize_crop_u8)
    data = _jpeg_bytes(rng)  # 480x224
    resize_dims = (336, 157)  # scale 0.70: narrower than the 352-wide crop
    for crop in [(-8, -3, 344, 154),    # overhang on all four sides
                 (-16, 29, 336, 157),   # left pad only
                 (0, 0, 352, 128),      # right/bottom overhang
                 (400, 200, 500, 250)]:  # fully outside
        pil = Image.open(io.BytesIO(data)).resize(resize_dims).crop(crop)
        want_u8 = np.asarray(pil.convert("RGB")).transpose(2, 0, 1)
        got_u8 = decode_resize_crop_u8(data, resize_dims, crop)
        assert got_u8.shape == want_u8.shape
        diff = np.abs(got_u8.astype(int) - want_u8.astype(int))
        assert diff.max() <= 1, f"crop={crop} max diff {diff.max()}"
        # float path: normalized like any black pixel
        want_f = normalize_img(
            np.asarray(pil.convert("RGB"))).transpose(2, 0, 1)
        got_f = decode_resize_crop_normalize(data, resize_dims, crop)
        np.testing.assert_allclose(got_f, want_f, atol=1.01 / 255 * 5)
        # flip composes with the padding exactly like PIL
        from PIL import Image as _I
        pil_f = pil.transpose(_I.FLIP_LEFT_RIGHT)
        got_flip = decode_resize_crop_u8(data, resize_dims, crop, flip=True)
        diff = np.abs(got_flip.astype(int) - np.asarray(
            pil_f.convert("RGB")).transpose(2, 0, 1).astype(int))
        assert diff.max() <= 1


def test_nuscenes_dataset_native_matches_pil_path(tmp_path, rng):
    """nuScenes loader rides the same NativeDecoder: val pipeline native vs
    PIL agrees within resample rounding; geometry identical."""
    from lss_carla_tpu.configs import DataAugConf, GridConf
    from lss_carla_tpu.data.fixtures_nuscenes import generate_nuscenes_fixture
    from lss_carla_tpu.data.nuscenes import NuScenesDataset

    root = generate_nuscenes_fixture(tmp_path, num_scenes=2,
                                     samples_per_scene=2, H=112, W=240)
    aug = DataAugConf(H=112, W=240, final_dim=(64, 176))
    ds_native = NuScenesDataset(root, False, aug, GridConf())
    assert ds_native._decoder.available
    ds_pil = NuScenesDataset(root, False, aug, GridConf())
    ds_pil._decoder.available = False
    a = ds_native[0]
    b = ds_pil[0]
    np.testing.assert_allclose(a[0], b[0], atol=_ATOL_1PX)
    for x, y in zip(a[1:], b[1:]):
        np.testing.assert_array_equal(x, y)


def test_nuscenes_dataset_native_uint8_mode(tmp_path, rng):
    """device_normalize uint8 items agree between native and PIL decode."""
    from lss_carla_tpu.configs import DataAugConf, GridConf
    from lss_carla_tpu.data.fixtures_nuscenes import generate_nuscenes_fixture
    from lss_carla_tpu.data.nuscenes import NuScenesDataset

    root = generate_nuscenes_fixture(tmp_path, num_scenes=2,
                                     samples_per_scene=2, H=112, W=240)
    aug = DataAugConf(H=112, W=240, final_dim=(64, 176))
    ds_native = NuScenesDataset(root, False, aug, GridConf(),
                                device_normalize=True)
    ds_pil = NuScenesDataset(root, False, aug, GridConf(),
                             device_normalize=True)
    ds_pil._decoder.available = False
    a, b = ds_native[0], ds_pil[0]
    assert a[0].dtype == np.uint8 == b[0].dtype
    assert np.abs(a[0].astype(np.int16) - b[0].astype(np.int16)).max() <= 1
