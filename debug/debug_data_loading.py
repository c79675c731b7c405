"""Loader sanity checks — reference ``debug/debug_data_loading.py`` rebuilt.

Validates batch tensor shapes, value ranges, GT positive ratio, rotation
orthogonality, and intrinsics sanity on a real (or synthetic) SimBEV tree.

    python debug/debug_data_loading.py --dataroot /data/SimBEV
    python debug/debug_data_loading.py --synthetic   # hermetic fixture
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.data.loader import DataLoader
from lss_carla_tpu.data.simbev import SegmentationData


def check(name, ok, detail=""):
    print(f"  {'✓' if ok else '⚠'} {name}" + (f" — {detail}" if detail else ""))
    return ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--bsz", type=int, default=4)
    p.add_argument("--batches", type=int, default=3)
    p.add_argument("--H", type=int, default=224)
    p.add_argument("--W", type=int, default=480)
    args = p.parse_args()

    if args.synthetic or args.dataroot is None:
        from lss_carla_tpu.data.fixtures import generate_fixture
        tmp = tempfile.mkdtemp(prefix="simbev_fixture_")
        args.dataroot = generate_fixture(tmp, H=args.H, W=args.W)
        print(f"using synthetic fixture at {args.dataroot}")

    aug = DataAugConf(H=args.H, W=args.W, final_dim=(128, 352))
    ds = SegmentationData(args.dataroot, is_train=True, data_aug_conf=aug,
                          grid_conf=GridConf())
    dl = DataLoader(ds, batch_size=args.bsz, shuffle=True, drop_last=True,
                    num_workers=2)

    all_ok = True
    pos_ratios = []
    for bi, batch in enumerate(dl):
        if bi >= args.batches:
            break
        imgs, rots, trans, intrins, post_rots, post_trans, binimgs = batch
        B, N = imgs.shape[:2]
        print(f"batch {bi}: imgs {imgs.shape}")
        all_ok &= check("imgs shape", imgs.shape == (args.bsz, 6, 3, 128, 352))
        all_ok &= check("imgs normalized",
                        -3.0 < imgs.mean() < 3.0 and imgs.std() < 3.0,
                        f"mean={imgs.mean():.3f} std={imgs.std():.3f}")
        all_ok &= check("binimg shape", binimgs.shape == (args.bsz, 1, 200, 200))
        rtr = np.einsum("bnij,bnkj->bnik", rots, rots)
        eye = np.tile(np.eye(3), (B, N, 1, 1))
        all_ok &= check("rotations orthonormal",
                        np.allclose(rtr, eye, atol=1e-4))
        det = np.linalg.det(rots)
        all_ok &= check("det(R) == ±1", np.allclose(np.abs(det), 1.0, atol=1e-4))
        all_ok &= check("intrinsics: fx,fy > 0",
                        bool((intrins[..., 0, 0] > 0).all()
                             and (intrins[..., 1, 1] > 0).all()))
        pos_ratios.append(binimgs.mean())

    ratio = float(np.mean(pos_ratios))
    all_ok &= check("GT positive ratio in (0.1%, 20%)", 0.001 < ratio < 0.2,
                    f"{100 * ratio:.2f}%")
    print("ALL CHECKS PASSED" if all_ok else "SOME CHECKS FAILED")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
