"""Per-camera viewpoint override (CVT viewchange feature)."""

import numpy as np
import pytest

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.data.fixtures import generate_fixture
from lss_carla_tpu.data.simbev import CAMERA_ORDER, SegmentationData


@pytest.fixture(scope="module")
def multi_orient_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("simbev_vo")
    return generate_fixture(root, num_scenes=2, samples_per_scene=2,
                            H=64, W=128,
                            orientations=("yaw0pitch0", "yaw30pitch0"))


def _aug():
    return DataAugConf(H=64, W=128, final_dim=(32, 64))


def test_override_swaps_only_named_camera(multi_orient_root):
    base = SegmentationData(multi_orient_root, is_train=False,
                            data_aug_conf=_aug(), grid_conf=GridConf())
    swapped = SegmentationData(
        multi_orient_root, is_train=False, data_aug_conf=_aug(),
        grid_conf=GridConf(), viewpoint_override={"front": "yaw30pitch0"})

    _, rots_b, *_ = base[0]
    _, rots_s, *_ = swapped[0]
    fi = CAMERA_ORDER.index("front")
    assert not np.allclose(rots_s[fi], rots_b[fi])
    for i in range(len(CAMERA_ORDER)):
        if i != fi:
            np.testing.assert_array_equal(rots_s[i], rots_b[i])
    # front extrinsics match the override orientation's own front camera
    alt = SegmentationData(multi_orient_root, is_train=False,
                           data_aug_conf=_aug(), grid_conf=GridConf(),
                           orientation="yaw30pitch0")
    _, rots_a, *_ = alt[0]
    np.testing.assert_array_equal(rots_s[fi], rots_a[fi])


def test_override_missing_token_falls_back(multi_orient_root, tmp_path):
    # an override orientation that exists but lacks this token: fall back
    ds = SegmentationData(
        multi_orient_root, is_train=False, data_aug_conf=_aug(),
        grid_conf=GridConf(), viewpoint_override={"back": "yaw30pitch0"})
    ds._override_lookup["yaw30pitch0"] = {}  # simulate missing tokens
    base = SegmentationData(multi_orient_root, is_train=False,
                            data_aug_conf=_aug(), grid_conf=GridConf())
    _, rots_o, *_ = ds[0]
    _, rots_b, *_ = base[0]
    np.testing.assert_array_equal(rots_o, rots_b)
