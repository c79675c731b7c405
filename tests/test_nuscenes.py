"""Devkit-free nuScenes data path: tables, geometry, labels, loaders."""

import os
import numpy as np
import pytest

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.data.fixtures_nuscenes import (generate_nuscenes_fixture,
                                                  rot_to_quat, _yaw_quat)
from lss_carla_tpu.data.nuscenes import (NuScenesDataset, NUSC_CAMERA_ORDER,
                                         compile_data_nuscenes, quat_to_rot)


@pytest.fixture(scope="module")
def nusc_root(tmp_path_factory):
    return generate_nuscenes_fixture(tmp_path_factory.mktemp("nusc"),
                                     num_scenes=3, samples_per_scene=3,
                                     H=112, W=240)


def _aug():
    return DataAugConf(H=112, W=240, final_dim=(64, 176))


def test_quat_roundtrip(rng):
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = quat_to_rot(q)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-9)
        q2 = rot_to_quat(R)
        R2 = quat_to_rot(q2)
        np.testing.assert_allclose(R2, R, atol=1e-8)


def test_scene_split_and_sample_chain(nusc_root):
    tr = NuScenesDataset(nusc_root, True, _aug(), GridConf())
    va = NuScenesDataset(nusc_root, False, _aug(), GridConf())
    assert len(tr) == 6 and len(va) == 3  # 3 scenes x 3 samples, 80/20


def test_item_contract(nusc_root):
    ds = NuScenesDataset(nusc_root, False, _aug(), GridConf())
    imgs, rots, trans, intrins, post_rots, post_trans, binimg = ds[0]
    assert imgs.shape == (6, 3, 64, 176) and imgs.dtype == np.float32
    assert rots.shape == (6, 3, 3)
    assert binimg.shape == (1, 200, 200)
    assert 0.0 < binimg.mean() < 0.2
    rtr = np.einsum("nij,nkj->nik", rots, rots)
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (6, 1, 1)), atol=1e-5)


def test_label_placement_matches_ego_frame(nusc_root):
    """A vehicle annotated at ego (x, y) must light up grid cell
    (i=(x+50)/0.5, j=(y+50)/0.5)."""
    ds = NuScenesDataset(nusc_root, True, _aug(), GridConf())
    tok = ds.samples[0]
    pose = ds._ego_pose_for(tok)
    ego_t = np.asarray(pose["translation"])
    ego_R = quat_to_rot(pose["rotation"])
    binimg = ds.get_binimg(tok)[0]
    hits = 0
    for ann in ds.t.anns[tok]:
        if not ds.t.category_name(ann).startswith("vehicle."):
            continue
        c_ego = ego_R.T @ (np.asarray(ann["translation"]) - ego_t)
        i = int((c_ego[0] + 50.0) / 0.5)
        j = int((c_ego[1] + 50.0) / 0.5)
        if 0 <= i < 200 and 0 <= j < 200:
            assert binimg[i, j] == 1.0, (c_ego, i, j)
            hits += 1
    assert hits > 0
    # the pedestrian annotation is excluded
    veh_area = binimg.sum()
    assert veh_area < 200 * 200 * 0.2


def test_nonvehicle_category_excluded(nusc_root):
    ds_all = NuScenesDataset(nusc_root, True, _aug(), GridConf(),
                             label_category_prefix="")  # everything
    ds_veh = NuScenesDataset(nusc_root, True, _aug(), GridConf())
    tok = ds_veh.samples[0]
    assert ds_all.get_binimg(tok).sum() > ds_veh.get_binimg(tok).sum()


def test_compile_data_nuscenes(nusc_root):
    tr, va = compile_data_nuscenes("v1.0-mini", nusc_root, _aug(),
                                   GridConf(), bsz=2, nworkers=0)
    batch = next(iter(tr))
    assert batch[0].shape == (2, 6, 3, 64, 176)
    assert batch[6].shape == (2, 1, 200, 200)


def test_camera_subset_train(nusc_root):
    aug = DataAugConf(H=112, W=240, final_dim=(64, 176), Ncams=5)
    ds = NuScenesDataset(nusc_root, True, aug, GridConf())
    np.random.seed(0)
    imgs, *_ = ds[0]
    assert imgs.shape[0] == 5


def test_train_e2e_on_nuscenes(nusc_root, tmp_path):
    """Two train steps through the full driver on the nuScenes path."""
    from lss_carla_tpu.training.loop import train
    r = train(dataroot=nusc_root, nepochs=1, bsz=2, nworkers=0,
              H=112, W=240, final_dim=(32, 64), ncams=6,
              xbound=(-50.0, 50.0, 1.5625), ybound=(-50.0, 50.0, 1.5625),
              dbound=(4.0, 45.0, 8.0),
              val_step=0, save_step=0, viz_step=0, max_steps=2,
              logdir=str(tmp_path / "run"), n_devices=1,
              dataset="nuscenes")
    assert r["counter"] == 2


def test_get_lidar_data_single_and_multisweep(nusc_root):
    """Devkit-free get_lidar_data (reference tools.py:23-77): (5, N) rows
    x,y,z,reflectance,dt in the key frame's ego frame; multi-sweep
    aggregation must ego-motion-compensate the older sweep so the same
    world points land at identical ego coordinates."""
    from lss_carla_tpu.data.nuscenes import NuScenesTables, get_lidar_data
    t = NuScenesTables(nusc_root)
    tok = next(iter(t.cam_data))
    one = get_lidar_data(t, nusc_root, tok, nsweeps=1)
    assert one.shape[0] == 5 and one.shape[1] == 48
    # fixture points: a radius-15 ring around the ego at world z=0.5 ->
    # ego-frame ranges ~15 in xy
    r = np.hypot(one[0], one[1])
    np.testing.assert_allclose(r, 15.0, atol=1e-6)
    assert np.all(one[4] == 0.0)  # key frame dt = 0

    two = get_lidar_data(t, nusc_root, tok, nsweeps=2)
    assert two.shape[1] == 96
    # the older sweep saw the SAME world points from a moved pose: after
    # compensation both halves coincide (sorted by angle)
    a, b = two[:3, :48], two[:3, 48:]
    key = np.argsort(np.arctan2(a[1], a[0]))
    key_b = np.argsort(np.arctan2(b[1], b[0]))
    np.testing.assert_allclose(a[:, key], b[:, key_b], atol=1e-9)
    np.testing.assert_allclose(two[4, 48:], 0.1, atol=1e-9)  # 100 ms older

    # min_distance drops close points
    none_left = get_lidar_data(t, nusc_root, tok, nsweeps=1,
                               min_distance=20.0)
    assert none_left.shape[1] == 0


def test_lidar_check_nuscenes(nusc_root, tmp_path):
    """Model-free lidar projection viz (reference explore.py:21-116)."""
    from lss_carla_tpu.explore import lidar_check
    paths = lidar_check(nusc_root, outdir=str(tmp_path / "lc"),
                        dataset="nuscenes", max_samples=1, nsweeps=2,
                        H=112, W=240, final_dim=(64, 176))
    assert len(paths) == 1 and os.path.exists(paths[0])


def test_device_normalize_uint8_mode(nusc_root):
    """uint8 item + host normalize_img reproduces the float path exactly
    (aug is deterministic on the val split, so items align)."""
    from lss_carla_tpu.ops.image import normalize_img
    ds_u = NuScenesDataset(nusc_root, False, _aug(), GridConf(),
                           device_normalize=True)
    ds_f = NuScenesDataset(nusc_root, False, _aug(), GridConf())
    imgs_u, *rest_u = ds_u[0]
    imgs_f, *rest_f = ds_f[0]
    assert imgs_u.dtype == np.uint8 and imgs_u.shape == imgs_f.shape
    renorm = normalize_img(imgs_u.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(renorm, imgs_f, atol=1e-5)
    np.testing.assert_array_equal(rest_u[-1], rest_f[-1])  # labels identical
