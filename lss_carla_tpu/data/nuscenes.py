"""nuScenes data path — devkit-free.

The reference's nuScenes pipeline is dead code (it imports a missing
``src/data.py`` and the nuscenes-devkit; SURVEY §2.14-2.15). This module
implements the same LSS data contract directly from the published nuScenes
table schema (v1.0 JSON tables), with no devkit dependency:

* tables read: scene, sample, sample_data, calibrated_sensor, sensor,
  ego_pose, sample_annotation, instance, category;
* per sample: 6 camera key frames, intrinsics from calibrated_sensor,
  extrinsics = sensor->ego (translation + wxyz quaternion) — consumed
  directly by the cam->ego composition like the original LSS;
* BEV label: vehicle.* annotations transformed global->ego at the sample's
  LIDAR_TOP (or first-camera) ego pose, box footprints rasterized onto the
  grid with the loaded-label convention (dim0 = ego X, dim1 = ego Y);
* same augmentation machinery as SimBEV (one draw per sample, homography
  tracked), same 7-tuple output.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.data.augment import (img_transform, post_homography,
                                        sample_augmentation)
from lss_carla_tpu.ops.geometry import gen_dx_bx
from lss_carla_tpu.ops.image import normalize_img

NUSC_CAMERA_ORDER = [
    'CAM_FRONT_LEFT', 'CAM_FRONT', 'CAM_FRONT_RIGHT',
    'CAM_BACK_LEFT', 'CAM_BACK', 'CAM_BACK_RIGHT',
]


def quat_to_rot(q) -> np.ndarray:
    """wxyz quaternion -> 3x3 rotation matrix (pure numpy)."""
    w, x, y, z = [float(v) for v in q]
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n == 0 else 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array([
        [1.0 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1.0 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1.0 - (xx + yy)],
    ])


def _load_table(table_dir: Path, name: str) -> List[dict]:
    with open(table_dir / f"{name}.json") as f:
        return json.load(f)


class NuScenesTables:
    """Indexed nuScenes v1.0 tables (the minimal devkit replacement)."""

    def __init__(self, dataroot, version: str = "v1.0-mini"):
        self.dataroot = Path(dataroot)
        table_dir = self.dataroot / version
        if not table_dir.exists():
            raise FileNotFoundError(f"nuScenes tables not found: {table_dir}")
        by_token = lambda rows: {r["token"]: r for r in rows}  # noqa: E731
        self.scene = _load_table(table_dir, "scene")
        self.sample = by_token(_load_table(table_dir, "sample"))
        self.sample_data = _load_table(table_dir, "sample_data")
        self.calibrated_sensor = by_token(
            _load_table(table_dir, "calibrated_sensor"))
        self.sensor = by_token(_load_table(table_dir, "sensor"))
        self.ego_pose = by_token(_load_table(table_dir, "ego_pose"))
        self.sample_annotation = _load_table(table_dir, "sample_annotation")
        self.instance = by_token(_load_table(table_dir, "instance"))
        self.category = by_token(_load_table(table_dir, "category"))
        # log table: scene -> map location (optional — only viz needs it)
        try:
            self.log = by_token(_load_table(table_dir, "log"))
        except FileNotFoundError:
            self.log = {}

        # index: sample_token -> {channel: sample_data record} (key frames)
        self.cam_data: Dict[str, Dict[str, dict]] = {}
        self.sample_data_by_token: Dict[str, dict] = {}
        for sd in self.sample_data:
            if "token" in sd:
                self.sample_data_by_token[sd["token"]] = sd
            if not sd.get("is_key_frame", True):
                continue
            cs = self.calibrated_sensor[sd["calibrated_sensor_token"]]
            channel = self.sensor[cs["sensor_token"]]["channel"]
            self.cam_data.setdefault(sd["sample_token"], {})[channel] = sd
        # index: sample_token -> [annotation]
        self.anns: Dict[str, List[dict]] = {}
        for a in self.sample_annotation:
            self.anns.setdefault(a["sample_token"], []).append(a)

    def category_name(self, ann: dict) -> str:
        inst = self.instance[ann["instance_token"]]
        return self.category[inst["category_token"]]["name"]

    def scene2map(self) -> Dict[str, str]:
        """scene name -> map location (reference ``explore.py:305-308``).

        Scenes without a resolvable log fall back to ``boston-seaport`` so
        table sets predating the log table still visualize."""
        out = {}
        for sc in self.scene:
            log = self.log.get(sc.get("log_token", ""), {})
            out[sc["name"]] = log.get("location", "boston-seaport")
        return out


def _pose_matrix(translation, rotation_quat, inverse: bool = False
                 ) -> np.ndarray:
    """4x4 homogeneous transform from translation + wxyz quaternion."""
    R = quat_to_rot(rotation_quat)
    t = np.asarray(translation, dtype=np.float64)
    m = np.eye(4)
    if inverse:
        m[:3, :3] = R.T
        m[:3, 3] = -R.T @ t
    else:
        m[:3, :3] = R
        m[:3, 3] = t
    return m


def get_lidar_data(tables: "NuScenesTables", dataroot, sample_token: str,
                   nsweeps: int = 1, min_distance: float = 2.2
                   ) -> np.ndarray:
    """At most ``nsweeps`` of LIDAR_TOP in the key frame's ego frame —
    the reference's ``get_lidar_data`` (``src/tools.py:23-77``) without the
    nuscenes-devkit: ``.pcd.bin`` sweeps are read directly (float32
    ``x,y,z,intensity,ring`` records), close points dropped, each sweep
    mapped sensor→ego(t)→global→ego(t_ref) with the table poses, and a dt
    row appended. Returns ``(5, N)``: x, y, z, reflectance, dt.
    """
    dataroot = Path(dataroot)
    ref_sd = tables.cam_data[sample_token]["LIDAR_TOP"]
    ref_pose = tables.ego_pose[ref_sd["ego_pose_token"]]
    ref_time = 1e-6 * ref_sd.get("timestamp", 0)
    car_from_global = _pose_matrix(ref_pose["translation"],
                                   ref_pose["rotation"], inverse=True)

    points = np.zeros((5, 0))
    sd = ref_sd
    for _ in range(nsweeps):
        raw = np.fromfile(dataroot / sd["filename"], dtype=np.float32)
        pc = raw.reshape(-1, 5)[:, :4].T.astype(np.float64)  # drop ring
        close = (np.abs(pc[0]) < min_distance) & \
                (np.abs(pc[1]) < min_distance)
        pc = pc[:, ~close]

        pose = tables.ego_pose[sd["ego_pose_token"]]
        cs = tables.calibrated_sensor[sd["calibrated_sensor_token"]]
        trans = (car_from_global
                 @ _pose_matrix(pose["translation"], pose["rotation"])
                 @ _pose_matrix(cs["translation"], cs["rotation"]))
        xyz1 = np.vstack([pc[:3], np.ones((1, pc.shape[1]))])
        pc[:3] = (trans @ xyz1)[:3]

        dt = ref_time - 1e-6 * sd.get("timestamp", 0)
        points = np.concatenate(
            [points, np.vstack([pc, np.full((1, pc.shape[1]), dt)])], axis=1)

        prev = sd.get("prev", "")
        if not prev or prev not in tables.sample_data_by_token:
            break
        sd = tables.sample_data_by_token[prev]
    return points


class NuScenesDataset:
    """LSS segmentation dataset over nuScenes tables (reference data
    contract: the 7-tuple of ``SegmentationData``)."""

    def __init__(self, dataroot, is_train: bool, data_aug_conf, grid_conf,
                 version: str = "v1.0-mini",
                 label_category_prefix: str = "vehicle.",
                 train_split_fraction: float = 0.8,
                 device_normalize: bool = False):
        self.dataroot = Path(dataroot)
        self.is_train = is_train
        # device_normalize: emit raw uint8 images (4x smaller host->device
        # transfers); ImageNet normalization then runs inside the jitted
        # program (models/lss.py get_cam_feats) — same contract as the
        # SimBEV loader's device_normalize
        self.device_normalize = device_normalize
        self.data_aug_conf = (data_aug_conf if isinstance(data_aug_conf,
                                                          DataAugConf)
                              else DataAugConf.from_dict(data_aug_conf))
        self.grid_conf = (grid_conf if isinstance(grid_conf, GridConf)
                          else GridConf.from_dict(grid_conf))
        self.label_category_prefix = label_category_prefix
        self.t = NuScenesTables(dataroot, version)

        scenes = sorted(self.t.scene, key=lambda s: s["name"])
        split = int(train_split_fraction * len(scenes))
        selected = scenes[:split] if is_train else scenes[split:]
        self.samples: List[str] = []
        for sc in selected:
            tok = sc["first_sample_token"]
            while tok:
                self.samples.append(tok)
                tok = self.t.sample[tok]["next"]

        self.dx, self.bx, self.nx = gen_dx_bx(
            self.grid_conf.xbound, self.grid_conf.ybound,
            self.grid_conf.zbound)
        # native C++ decode fast path (shared with the SimBEV loader);
        # kicks in whenever the sampled rotation is 0 — i.e. always for
        # the deterministic val split, and for unaugmented train configs
        from lss_carla_tpu.data.decode import NativeDecoder
        self._decoder = NativeDecoder(
            (self.data_aug_conf.W, self.data_aug_conf.H),
            device_normalize=device_normalize)
        print(self)

    def choose_cams(self) -> Sequence[str]:
        ncams = self.data_aug_conf.Ncams
        if self.is_train and ncams < len(NUSC_CAMERA_ORDER):
            idx = sorted(np.random.choice(len(NUSC_CAMERA_ORDER), ncams,
                                          replace=False).tolist())
            return [NUSC_CAMERA_ORDER[i] for i in idx]
        return list(NUSC_CAMERA_ORDER)

    def get_image_data(self, sample_token: str, cams: Sequence[str]):
        imgs, rots, trans, intrins, post_rots, post_trans = \
            [], [], [], [], [], []
        aug = sample_augmentation(self.data_aug_conf, self.is_train)
        resize, resize_dims, crop, flip, rotate = aug
        cam_data = self.t.cam_data[sample_token]
        for cam in cams:
            sd = cam_data[cam]
            cs = self.t.calibrated_sensor[sd["calibrated_sensor_token"]]
            img_path = self.dataroot / sd["filename"]
            # native C++ fast path (rotation falls back to PIL)
            img_chw = self._decoder.decode(img_path, resize_dims, crop,
                                           flip, rotate)
            if img_chw is not None:
                post_rot2, post_tran2 = post_homography(
                    resize, crop, flip, rotate)
            else:
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
            imgs.append(img_chw)
            intrins.append(np.asarray(cs["camera_intrinsic"],
                                      dtype=np.float32))
            # sensor->ego, used as-is by the cam->ego composition (the
            # original LSS convention)
            rots.append(quat_to_rot(cs["rotation"]).astype(np.float32))
            trans.append(np.asarray(cs["translation"], dtype=np.float32))
            post_rots.append(post_rot3)
            post_trans.append(post_tran3)
        return (np.stack(imgs), np.stack(rots), np.stack(trans),
                np.stack(intrins), np.stack(post_rots), np.stack(post_trans))

    def _ego_pose_for(self, sample_token: str) -> dict:
        cam_data = self.t.cam_data[sample_token]
        sd = cam_data.get("CAM_FRONT") or next(iter(cam_data.values()))
        return self.t.ego_pose[sd["ego_pose_token"]]

    def get_binimg(self, sample_token: str) -> np.ndarray:
        """Rasterize vehicle box footprints into the (1, X, Y) BEV mask,
        loaded-label convention (dim0 = ego X, dim1 = ego Y)."""
        pose = self._ego_pose_for(sample_token)
        ego_t = np.asarray(pose["translation"])
        ego_R = quat_to_rot(pose["rotation"])
        X, Y = int(self.nx[0]), int(self.nx[1])
        canvas = Image.new("L", (Y, X), 0)  # PIL (width=Y, height=X)
        draw = ImageDraw.Draw(canvas)
        for ann in self.t.anns.get(sample_token, []):
            if not self.t.category_name(ann).startswith(
                    self.label_category_prefix):
                continue
            # global -> ego
            c = ego_R.T @ (np.asarray(ann["translation"]) - ego_t)
            R = ego_R.T @ quat_to_rot(ann["rotation"])
            w, l, _h = [float(v) for v in ann["size"]]
            # box frame: x = forward (length), y = left (width)
            corners_box = np.array([
                [l / 2, w / 2, 0], [l / 2, -w / 2, 0],
                [-l / 2, -w / 2, 0], [-l / 2, w / 2, 0]])
            corners = (R @ corners_box.T).T + c  # (4, 3) ego frame
            # ego (x, y) -> grid (i, j): i = (x - (bx - dx/2)) / dx
            gi = (corners[:, 0] - (self.bx[0] - self.dx[0] / 2)) / self.dx[0]
            gj = (corners[:, 1] - (self.bx[1] - self.dx[1] / 2)) / self.dx[1]
            # PIL polygon: (col=j, row=i)
            draw.polygon([(float(j), float(i)) for i, j in zip(gi, gj)],
                         fill=1)
        mask = np.asarray(canvas, dtype=np.float32)  # (X rows, Y cols)
        return mask[None]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        tok = self.samples[index]
        cams = self.choose_cams()
        imgs, rots, trans, intrins, post_rots, post_trans = \
            self.get_image_data(tok, cams)
        binimg = self.get_binimg(tok)
        return imgs, rots, trans, intrins, post_rots, post_trans, binimg

    def __str__(self):
        split = "train" if self.is_train else "val"
        return f"NuScenesDataset ({split}): {len(self)} samples"


def compile_data_nuscenes(version, dataroot, data_aug_conf, grid_conf,
                          bsz: int, nworkers: int,
                          drop_to_multiple_of: Optional[int] = None,
                          device_normalize: bool = False,
                          shard_index: int = 0, num_shards: int = 1):
    """nuScenes analog of ``compile_data`` (same loader semantics, incl.
    the per-host ``shard_index``/``num_shards`` multi-host input shards)."""
    from lss_carla_tpu.data.loader import DataLoader
    train_ds = NuScenesDataset(dataroot, True, data_aug_conf, grid_conf,
                               version=version,
                               device_normalize=device_normalize)
    val_ds = NuScenesDataset(dataroot, False, data_aug_conf, grid_conf,
                             version=version,
                             device_normalize=device_normalize)
    trainloader = DataLoader(train_ds, batch_size=bsz, shuffle=True,
                             drop_last=True, num_workers=nworkers,
                             shard_index=shard_index, num_shards=num_shards)
    valloader = DataLoader(val_ds, batch_size=bsz, shuffle=False,
                           pad_last=True, num_workers=nworkers,
                           shard_index=shard_index, num_shards=num_shards)
    return trainloader, valloader
