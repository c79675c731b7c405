"""Three-way label trace + geometric closure — reference
``debug/final_check_with_raw.py`` rebuilt.

For the SAME sample, compares three label sources pixel-exactly:

  1. the raw ``bev_*.npz`` file with ``flipud`` applied by hand,
  2. ``SegmentationData.get_binimg`` (the label-only path),
  3. the full ``__getitem__`` batch tuple (what training consumes).

Then closes the loop geometrically: converts every occupied BEV cell to
ego meters (grid dim 0 = ego X, see docs/COORDINATES.md), projects the
forward cells through the front camera's stored extrinsics+intrinsics
(``ops.geometry.ego_to_cam``), and asserts they land inside the front
image while the same cells mirrored behind the ego do not — i.e. the
flipped label is the one consistent with the camera geometry, not just
with our own convention.

    python debug/final_check_with_raw.py [--dataroot ...] [--index 0]
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.data.simbev import CAMERA_ORDER, SegmentationData
from lss_carla_tpu.ops.geometry import ego_to_cam, gen_dx_bx, get_only_in_img_mask


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default=None)
    p.add_argument("--index", type=int, default=0)
    args = p.parse_args()
    if args.dataroot is None:
        from lss_carla_tpu.data.fixtures import generate_fixture
        args.dataroot = generate_fixture(
            tempfile.mkdtemp(prefix="simbev_fixture_"), num_scenes=2,
            samples_per_scene=4, vehicle_x_range=(2.0, 35.0))
        print(f"using forward-biased synthetic fixture at {args.dataroot}")

    # deterministic aug so __getitem__ is comparable across runs
    aug = DataAugConf(resize_lim=(1.0, 1.0), rot_lim=(0.0, 0.0),
                      rand_flip=False, bot_pct_lim=(0.0, 0.0))
    gc = GridConf()
    ds = SegmentationData(args.dataroot, is_train=True, data_aug_conf=aug,
                          grid_conf=gc)
    sample = ds.samples[args.index]
    print(f"sample: {sample['bev']}")

    # --- three-way pixel-exact trace -----------------------------------
    bev = np.load(Path(sample["meta_dir"]) / sample["bev"])["bev"]
    raw = ((bev[1] > 0) | (bev[2] > 0) | (bev[3] > 0)).astype(np.float32)
    hand_flipped = np.flipud(raw).copy()
    from_binimg = np.asarray(ds.get_binimg(sample)[0])
    from_getitem = np.asarray(ds[args.index][6][0])

    ok_a = np.array_equal(hand_flipped, from_binimg)
    ok_b = np.array_equal(from_binimg, from_getitem)
    print(f"flipud(raw) == get_binimg       : {'✓' if ok_a else '✗'}")
    print(f"get_binimg  == __getitem__ label: {'✓' if ok_b else '✗'}")

    # --- geometric closure via the front camera ------------------------
    dx, bx, _ = gen_dx_bx(gc.xbound, gc.ybound, gc.zbound)
    ii, jj = np.nonzero(from_binimg)
    if len(ii) == 0:
        print("⚠ sample has no vehicle pixels — pick another --index")
        return 1
    x = bx[0] + dx[0] * ii  # ego X (forward)
    y = bx[1] + dx[1] * jj  # ego Y
    fwd = x > 0
    if not fwd.any():
        print("⚠ no forward vehicle cells in this sample — inconclusive")
        return 1

    import jax
    # debug tooling runs on the host CPU (never grabs the TPU)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    z = np.full_like(x, 1.0)  # roughly vehicle height over ground
    pts_front = jnp.asarray(np.stack([x[fwd], y[fwd], z[fwd]]))
    pts_mirror = jnp.asarray(
        np.stack([-x[fwd], y[fwd], z[fwd]]))  # same cells, behind ego

    # the forward-facing trio together covers every forward bearing; a
    # single camera's FOV would miss cells at high lateral offset
    vis_f = np.zeros(int(fwd.sum()), bool)
    vis_m = np.zeros(int(fwd.sum()), bool)
    for name in ("front_left", "front", "front_right"):
        c = CAMERA_ORDER.index(name)
        extrin = np.asarray(sample["extrinsics"][c], np.float32)
        intrin = np.asarray(sample["intrinsics"][c], np.float32)
        rot, tran = extrin[:3, :3], extrin[:3, 3]
        with Image.open(Path(args.dataroot) / sample["images"][c]) as im:
            W, H = im.size
        proj_f = ego_to_cam(pts_front, rot, tran, intrin)
        proj_m = ego_to_cam(pts_mirror, rot, tran, intrin)
        vis_f |= np.asarray(get_only_in_img_mask(proj_f, H, W))
        vis_m |= np.asarray(get_only_in_img_mask(proj_m, H, W))
    vis_f, vis_m = vis_f.mean(), vis_m.mean()
    print(f"forward cells visible in front-facing cameras : {100 * vis_f:5.1f}%")
    print(f"mirrored (behind-ego) cells visible there     : {100 * vis_m:5.1f}%")

    if ok_a and ok_b and vis_f > vis_m:
        print("✓ SUCCESS: label trace is pixel-exact and the flipped label "
              "is the one consistent with the front-camera geometry")
        return 0
    print("⚠ FAILURE: label trace or camera-geometry closure failed")
    return 1


if __name__ == "__main__":
    sys.exit(main())
