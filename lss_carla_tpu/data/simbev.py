"""SimBEV dataset: scene scan, sample loading, label decoding.

Host-side equivalent of reference ``src/data_simbev.py``. Same directory
schema and semantics:

* ``dataroot/SimBEV_cvt_label/scene_*/yaw0pitch0/meta.json`` lists samples;
  scenes are sorted and split 80/20 into train/val (``data_simbev.py:79-91``);
* each sample carries 6 camera image paths (relative to dataroot), 3x3
  intrinsics, and 4x4 ego->cam extrinsics used as-is
  (``data_simbev.py:187-192``);
* the BEV label is ``bev_*.npz`` with an (8, 200, 200) class stack; classes
  1|2|3 merge into a binary vehicle mask, then ``np.flipud`` for the
  SimBEV-vs-LSS Y-axis convention (``data_simbev.py:236-242``);
* ONE augmentation draw per sample shared by all cameras
  (``data_simbev.py:166-168``); train may drop to a random Ncams-camera
  subset (``data_simbev.py:248-258``).

Returns numpy arrays in the reference's tensor layouts
(imgs (N, 3, H, W) normalized float32, etc.) so downstream code is
drop-in compatible.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Sequence

import numpy as np
from PIL import Image

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.data.augment import (img_transform, post_homography,
                                        sample_augmentation)
from lss_carla_tpu.ops.geometry import gen_dx_bx
from lss_carla_tpu.ops.image import normalize_img

CAMERA_ORDER = [
    'front_left', 'front', 'front_right',
    'back_left', 'back', 'back_right',
]

TRAIN_SPLIT_FRACTION = 0.8


def _perturb_extrinsics(rot: np.ndarray, tran: np.ndarray,
                        rot_deg_std: float, trans_m_std: float):
    """Small-angle Gaussian perturbation of an extrinsic pair (train-time
    robustness augmentation; the hook the CVT loader sketches at
    ``scripts/cvt_simbev_dataloader.py:42-44``)."""
    angles = np.random.normal(0.0, np.deg2rad(rot_deg_std), size=3)
    cx, cy, cz = np.cos(angles)
    sx, sy, sz = np.sin(angles)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    noise = (Rz @ Ry @ Rx).astype(np.float32)
    d_tran = np.random.normal(0.0, trans_m_std, size=3).astype(np.float32)
    return (noise @ rot).astype(np.float32), tran + d_tran


def scan_samples(dataroot, is_train: bool,
                 orientation: str = "yaw0pitch0") -> List[dict]:
    """Scan scene dirs, apply the sorted 80/20 scene split, read meta.json."""
    dataroot = Path(dataroot)
    labels_dir = dataroot / "SimBEV_cvt_label"
    if not labels_dir.exists():
        raise FileNotFoundError(f"Labels directory not found: {labels_dir}")

    scene_dirs = sorted(d for d in labels_dir.iterdir()
                        if d.is_dir() and d.name.startswith("scene_"))
    if not scene_dirs:
        raise FileNotFoundError(f"No scene directories found in {labels_dir}")

    train_split = int(TRAIN_SPLIT_FRACTION * len(scene_dirs))
    selected = scene_dirs[:train_split] if is_train else scene_dirs[train_split:]

    samples = []
    for scene_dir in selected:
        meta_path = scene_dir / orientation / "meta.json"
        if not meta_path.exists():
            continue
        with open(meta_path) as f:
            meta_samples = json.load(f)
        for s in meta_samples:
            s["scene_dir"] = scene_dir
            s["meta_dir"] = meta_path.parent
            samples.append(s)

    if not samples:
        split = "train" if is_train else "val"
        raise FileNotFoundError(f"No samples found for {split} split in {labels_dir}")
    return samples


class SimBEVDataset:
    """Map-style dataset over SimBEV samples.

    Optional extensions beyond the reference loader (schema features of the
    CVT SimBEV loader the reference keeps as a vestigial reference,
    ``scripts/cvt_simbev_dataloader.py:42-44,240-247``):

    * ``orientation``: which camera-rig orientation directory to read
      (default the reference's hard-coded ``yaw0pitch0``);
    * ``extrinsic_noise``: (rot_deg_std, trans_m_std) — train-time Gaussian
      perturbation of the per-camera extrinsics (robustness augmentation);
    * ``label_mode``: ``"vehicle_binary"`` (reference behavior: classes
      1|2|3 merged) or ``"multiclass"`` with ``label_classes`` giving the
      channel indices to stack (stretch config: drivable + 3 vehicle types);
    * ``viewpoint_override``: {camera_name: orientation} — per-camera swap
      of image + intrinsics + extrinsics from another rig orientation of the
      same sample token (the CVT loader's ``viewchange`` feature,
      ``scripts/cvt_simbev_dataloader.py:240-247``). Cameras whose token is
      missing in the override orientation fall back to the base sample.
    """

    def __init__(self, dataroot, is_train: bool, data_aug_conf, grid_conf,
                 orientation: str = "yaw0pitch0",
                 extrinsic_noise=None,
                 label_mode: str = "vehicle_binary",
                 label_classes=(0, 1, 2, 3),
                 viewpoint_override=None,
                 use_native: bool = True,
                 device_normalize: bool = False):
        self.dataroot = Path(dataroot)
        self.is_train = is_train
        self.data_aug_conf = (data_aug_conf if isinstance(data_aug_conf, DataAugConf)
                              else DataAugConf.from_dict(data_aug_conf))
        self.grid_conf = (grid_conf if isinstance(grid_conf, GridConf)
                          else GridConf.from_dict(grid_conf))
        self.orientation = orientation
        self.extrinsic_noise = extrinsic_noise
        self.label_mode = label_mode
        self.label_classes = tuple(label_classes)
        # device_normalize: emit raw uint8 images (4x smaller host->device
        # transfer); the model normalizes inside the jitted program
        self.device_normalize = device_normalize
        self.samples = scan_samples(dataroot, is_train, orientation)
        self.viewpoint_override = dict(viewpoint_override or {})
        self._override_lookup = {}
        for ov in set(self.viewpoint_override.values()):
            self._override_lookup[ov] = {
                s.get("token"): s
                for s in scan_samples(dataroot, is_train, ov)}
        self.dx, self.bx, self.nx = gen_dx_bx(
            self.grid_conf.xbound, self.grid_conf.ybound, self.grid_conf.zbound)
        from lss_carla_tpu.data.decode import NativeDecoder
        self._decoder = NativeDecoder(
            (self.data_aug_conf.W, self.data_aug_conf.H),
            device_normalize=self.device_normalize, enabled=use_native)
        self._native = self._decoder.available
        print(self)

    def choose_cams(self) -> Sequence[int]:
        all_cams = list(range(len(CAMERA_ORDER)))
        ncams = self.data_aug_conf.Ncams
        if self.is_train and ncams < len(CAMERA_ORDER):
            return sorted(np.random.choice(all_cams, ncams,
                                           replace=False).tolist())
        return all_cams

    def get_image_data(self, sample, cam_indices):
        imgs, rots, trans, intrins, post_rots, post_trans = [], [], [], [], [], []
        aug = sample_augmentation(self.data_aug_conf, self.is_train)
        resize, resize_dims, crop, flip, rotate = aug

        for cam_idx in cam_indices:
            src = sample
            cam_name = CAMERA_ORDER[cam_idx]
            if cam_name in self.viewpoint_override:
                ov = self.viewpoint_override[cam_name]
                src = self._override_lookup[ov].get(sample.get("token"),
                                                    sample)
            img_path = self.dataroot / src["images"][cam_idx]
            intrin = np.asarray(src["intrinsics"][cam_idx], dtype=np.float32)
            extrin = np.asarray(src["extrinsics"][cam_idx], dtype=np.float32)
            rot, tran = extrin[:3, :3], extrin[:3, 3]
            if self.is_train and self.extrinsic_noise is not None:
                rot, tran = _perturb_extrinsics(rot, tran,
                                                *self.extrinsic_noise)

            # native fast path: decode+resize+crop+flip in C++ (shared
            # NativeDecoder; PIL fallback on rotation/non-JPEG/error)
            img_chw = self._decoder.decode(img_path, resize_dims, crop,
                                           flip, rotate)
            if img_chw is not None:
                post_rot2, post_tran2 = post_homography(
                    resize, crop, flip, rotate)

            if img_chw is None:
                img = Image.open(img_path)
                img, post_rot2, post_tran2 = img_transform(
                    img, resize, resize_dims, crop, flip, rotate)
                rgb = np.asarray(img.convert("RGB"))
                img_chw = (rgb.transpose(2, 0, 1) if self.device_normalize
                           else normalize_img(rgb).transpose(2, 0, 1))

            post_rot3 = np.eye(3, dtype=np.float32)
            post_tran3 = np.zeros(3, dtype=np.float32)
            post_rot3[:2, :2] = post_rot2
            post_tran3[:2] = post_tran2

            imgs.append(img_chw)  # normalized, reference NCHW layout
            intrins.append(intrin)
            rots.append(rot)
            trans.append(tran)
            post_rots.append(post_rot3)
            post_trans.append(post_tran3)

        return (np.stack(imgs), np.stack(rots), np.stack(trans),
                np.stack(intrins), np.stack(post_rots), np.stack(post_trans))

    def get_binimg(self, sample) -> np.ndarray:
        bev = np.load(Path(sample["meta_dir"]) / sample["bev"])["bev"]
        if self.label_mode == "vehicle_binary":
            vehicle = ((bev[1] > 0) | (bev[2] > 0)
                       | (bev[3] > 0)).astype(np.float32)
            return np.flipud(vehicle).copy()[None]
        elif self.label_mode == "multiclass":
            chans = [np.flipud((bev[c] > 0).astype(np.float32)).copy()
                     for c in self.label_classes]
            return np.stack(chans)
        raise ValueError(f"unknown label_mode: {self.label_mode}")

    def __len__(self):
        return len(self.samples)

    def __str__(self):
        split = "train" if self.is_train else "val"
        return f"SimBEVDataset ({split}): {len(self)} samples"


class SegmentationData(SimBEVDataset):
    """Training/validation items: the reference 7-tuple."""

    def __getitem__(self, index):
        sample = self.samples[index]
        cams = self.choose_cams()
        imgs, rots, trans, intrins, post_rots, post_trans = \
            self.get_image_data(sample, cams)
        binimg = self.get_binimg(sample)
        return imgs, rots, trans, intrins, post_rots, post_trans, binimg


class VizData(SimBEVDataset):
    """Adds an empty (3, 0) lidar tensor (reference data_simbev.py:268-291)."""

    def __getitem__(self, index):
        sample = self.samples[index]
        cams = self.choose_cams()
        imgs, rots, trans, intrins, post_rots, post_trans = \
            self.get_image_data(sample, cams)
        lidar = np.empty((3, 0), dtype=np.float32)
        binimg = self.get_binimg(sample)
        return imgs, rots, trans, intrins, post_rots, post_trans, lidar, binimg
