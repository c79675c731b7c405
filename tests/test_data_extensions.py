"""Tests for the loader extensions beyond the reference: multiclass labels,
extrinsic noise, orientation selection."""

import numpy as np
import pytest

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.data.fixtures import generate_fixture
from lss_carla_tpu.data.simbev import (SegmentationData, _perturb_extrinsics,
                                       scan_samples)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("simbev_ext")
    return generate_fixture(root, num_scenes=2, samples_per_scene=2,
                            H=64, W=128)


def _aug():
    return DataAugConf(H=64, W=128, final_dim=(32, 64))


def test_multiclass_labels(fixture_root):
    ds = SegmentationData(fixture_root, is_train=False, data_aug_conf=_aug(),
                          grid_conf=GridConf(), label_mode="multiclass",
                          label_classes=(0, 1, 2, 3))
    *_, binimg = ds[0]
    assert binimg.shape == (4, 200, 200)
    # vehicle channels match the reference binary mask union
    ds_bin = SegmentationData(fixture_root, is_train=False,
                              data_aug_conf=_aug(), grid_conf=GridConf())
    *_, bin_ref = ds_bin[0]
    union = (binimg[1:] > 0).any(axis=0).astype(np.float32)
    np.testing.assert_array_equal(union, bin_ref[0])


def test_extrinsic_noise_perturbs_only_train(fixture_root):
    np.random.seed(0)
    ds_noisy = SegmentationData(fixture_root, is_train=True,
                                data_aug_conf=_aug(), grid_conf=GridConf(),
                                extrinsic_noise=(1.0, 0.02))
    ds_clean = SegmentationData(fixture_root, is_train=True,
                                data_aug_conf=_aug(), grid_conf=GridConf())
    _, rots_n, trans_n, *_ = ds_noisy[0]
    _, rots_c, trans_c, *_ = ds_clean[0]
    assert not np.allclose(rots_n, rots_c)
    # still (approximately) rotations
    rtr = np.einsum("nij,nkj->nik", rots_n, rots_n)
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (6, 1, 1)), atol=1e-4)
    # val never perturbs
    ds_val = SegmentationData(fixture_root, is_train=False,
                              data_aug_conf=_aug(), grid_conf=GridConf(),
                              extrinsic_noise=(1.0, 0.02))
    _, rots_v, *_ = ds_val[0]
    np.testing.assert_array_equal(
        rots_v, SegmentationData(fixture_root, is_train=False,
                                 data_aug_conf=_aug(),
                                 grid_conf=GridConf())[0][1])


def test_perturb_extrinsics_zero_noise_identity():
    rot = np.eye(3, dtype=np.float32)
    tran = np.zeros(3, dtype=np.float32)
    r2, t2 = _perturb_extrinsics(rot, tran, 0.0, 0.0)
    np.testing.assert_allclose(r2, rot, atol=1e-7)
    np.testing.assert_allclose(t2, tran, atol=1e-7)


def test_unknown_orientation_raises(fixture_root):
    with pytest.raises(FileNotFoundError):
        scan_samples(fixture_root, is_train=True, orientation="yaw90pitch0")


def test_unknown_label_mode_raises(fixture_root):
    ds = SegmentationData(fixture_root, is_train=False, data_aug_conf=_aug(),
                          grid_conf=GridConf(), label_mode="bogus")
    with pytest.raises(ValueError):
        ds[0]
