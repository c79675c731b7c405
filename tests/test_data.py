import numpy as np
import pytest
from PIL import Image

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.data.augment import img_transform, sample_augmentation
from lss_carla_tpu.data.fixtures import generate_fixture
from lss_carla_tpu.data.loader import DataLoader, compile_data
from lss_carla_tpu.data.simbev import SegmentationData, VizData, scan_samples


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("simbev")
    return generate_fixture(root, num_scenes=3, samples_per_scene=4,
                            H=112, W=240)


def small_aug():
    return DataAugConf(H=112, W=240, final_dim=(64, 176))


def test_scene_split(fixture_root):
    train = scan_samples(fixture_root, is_train=True)
    val = scan_samples(fixture_root, is_train=False)
    # 3 scenes -> int(0.8*3)=2 train, 1 val
    assert len(train) == 8 and len(val) == 4
    train_scenes = {s["scene_dir"].name for s in train}
    val_scenes = {s["scene_dir"].name for s in val}
    assert train_scenes.isdisjoint(val_scenes)


def test_segmentation_item_shapes(fixture_root):
    ds = SegmentationData(fixture_root, is_train=False,
                          data_aug_conf=small_aug(), grid_conf=GridConf())
    imgs, rots, trans, intrins, post_rots, post_trans, binimg = ds[0]
    assert imgs.shape == (6, 3, 64, 176) and imgs.dtype == np.float32
    assert rots.shape == (6, 3, 3)
    assert trans.shape == (6, 3)
    assert intrins.shape == (6, 3, 3)
    assert post_rots.shape == (6, 3, 3)
    assert post_trans.shape == (6, 3)
    assert binimg.shape == (1, 200, 200)
    pos_ratio = binimg.mean()
    assert 0.0 < pos_ratio < 0.2  # sparse vehicle mask
    # rotation matrices orthonormal
    rtr = np.einsum("nij,nkj->nik", rots, rots)
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (6, 1, 1)), atol=1e-5)


def test_vizdata_adds_empty_lidar(fixture_root):
    ds = VizData(fixture_root, is_train=False, data_aug_conf=small_aug(),
                 grid_conf=GridConf())
    item = ds[0]
    assert len(item) == 8
    assert item[6].shape == (3, 0)


def test_camera_subset_dropout(fixture_root):
    aug = DataAugConf(H=112, W=240, final_dim=(64, 176), Ncams=3)
    ds = SegmentationData(fixture_root, is_train=True, data_aug_conf=aug,
                          grid_conf=GridConf())
    np.random.seed(0)
    imgs, *_ = ds[0]
    assert imgs.shape[0] == 3


def test_dataloader_batching(fixture_root):
    ds = SegmentationData(fixture_root, is_train=True,
                          data_aug_conf=small_aug(), grid_conf=GridConf())
    dl = DataLoader(ds, batch_size=3, shuffle=True, drop_last=True,
                    num_workers=2)
    assert len(dl) == 2  # 8 samples, bsz 3, drop_last
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0][0].shape == (3, 6, 3, 64, 176)
    assert batches[0][6].shape == (3, 1, 200, 200)


def test_val_loader_deterministic(fixture_root):
    _, valloader = compile_data("unused", fixture_root, small_aug(),
                                GridConf(), bsz=2, nworkers=2)
    a = [b[0] for b in valloader]
    b = [b[0] for b in valloader]
    assert len(a) == len(b) == 2
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_img_transform_homography_tracks_pixels():
    """A marked source pixel must land where post_rot @ p + post_tran says."""
    W, H = 240, 112
    src = Image.new("RGB", (W, H), (0, 0, 0))
    px, py = 120, 60
    for dx in range(-1, 2):
        for dy in range(-1, 2):
            src.putpixel((px + dx, py + dy), (255, 255, 255))

    for (resize, flip, rotate) in [(1.0, False, 0.0), (0.75, False, 0.0),
                                   (1.2, True, 0.0), (1.0, False, 8.0),
                                   (0.9, True, -6.0)]:
        resize_dims = (int(W * resize), int(H * resize))
        fW, fH = 176, 64
        crop_w = max(0, (resize_dims[0] - fW) // 2)
        crop_h = max(0, resize_dims[1] - fH)
        crop = (crop_w, crop_h, crop_w + fW, crop_h + fH)
        out, post_rot, post_tran = img_transform(
            src, resize, resize_dims, crop, flip, rotate)
        pred = post_rot @ np.array([px, py], dtype=np.float64) + post_tran
        arr = np.asarray(out).sum(-1)
        if not ((0 <= pred[0] < fW) and (0 <= pred[1] < fH)):
            continue
        ys, xs = np.nonzero(arr > 200)
        assert len(xs) > 0, f"marker lost for {(resize, flip, rotate)}"
        d = np.hypot(xs - pred[0], ys - pred[1]).min()
        assert d < 2.5, f"homography off by {d}px for {(resize, flip, rotate)}"


def test_sample_augmentation_val_deterministic():
    conf = small_aug()
    a = sample_augmentation(conf, is_train=False)
    b = sample_augmentation(conf, is_train=False)
    assert a == b
    resize, resize_dims, crop, flip, rotate = a
    assert resize == max(64 / 112, 176 / 240)
    assert not flip and rotate == 0.0
    # crop is exactly final_dim sized
    assert crop[2] - crop[0] == 176 and crop[3] - crop[1] == 64
