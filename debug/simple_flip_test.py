"""Which flip aligns raw SimBEV labels with the LSS grid? — reference
``debug/simple_flip_test.py`` rebuilt.

The raw ``bev_*.npz`` arrays are stored with the forward axis inverted
relative to the LSS grid convention (grid dim 0 = ego X / forward, see
docs/COORDINATES.md). This script takes raw label files and compares the
vehicle-mass centroid along the forward axis under the four candidate
conventions — no flip, ``flipud`` (forward-axis flip, the framework's fix),
``fliplr`` (lateral flip), and both — and prints which one moves the mass
in FRONT of the ego on forward-biased data. It also demonstrates that
``fliplr`` cannot be the fix: it leaves the forward axis untouched.

Hermetic by default (forward-biased synthetic fixture); point ``--dataroot``
at a real SimBEV tree to re-run the original investigation.

    python debug/simple_flip_test.py [--dataroot ...] [--samples 6]
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lss_carla_tpu.data.simbev import scan_samples


def forward_centroid(mask: np.ndarray) -> float:
    """Mean occupied cell index along dim 0 (= ego X after the fix)."""
    ii, _ = np.nonzero(mask)
    return float(ii.mean()) if len(ii) else float("nan")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default=None)
    p.add_argument("--samples", type=int, default=6)
    args = p.parse_args()
    if args.dataroot is None:
        from lss_carla_tpu.data.fixtures import generate_fixture
        args.dataroot = generate_fixture(
            tempfile.mkdtemp(prefix="simbev_fixture_"), num_scenes=2,
            samples_per_scene=6, vehicle_x_range=(2.0, 35.0))
        print(f"using forward-biased synthetic fixture at {args.dataroot}")

    samples = scan_samples(args.dataroot, is_train=True)[:args.samples]
    conventions = {
        "raw (no flip)": lambda m: m,
        "flipud (forward-axis)": lambda m: np.flipud(m),
        "fliplr (lateral-axis)": lambda m: np.fliplr(m),
        "flipud+fliplr": lambda m: np.flipud(np.fliplr(m)),
    }
    sums = {k: [] for k in conventions}
    center = None
    for sample in samples:
        bev = np.load(Path(sample["meta_dir"]) / sample["bev"])["bev"]
        raw = ((bev[1] > 0) | (bev[2] > 0) | (bev[3] > 0)).astype(np.float32)
        center = (raw.shape[0] - 1) / 2.0
        for name, fn in conventions.items():
            c = forward_centroid(fn(raw))
            if not np.isnan(c):
                sums[name].append(c)

    print(f"\n{len(samples)} raw labels, grid center = {center:.1f}")
    print(f"{'convention':24s} {'mean fwd cell':>14s}  verdict")
    verdicts = {}
    for name, vals in sums.items():
        mean = float(np.mean(vals)) if vals else float("nan")
        front = mean > center
        verdicts[name] = front
        print(f"{name:24s} {mean:14.1f}  "
              f"{'vehicles in FRONT' if front else 'vehicles in BACK'}")

    # fliplr must not change the forward centroid at all — it is a flip of
    # the wrong axis, which was the reference's original bug hypothesis
    lateral_inert = np.allclose(sums["raw (no flip)"],
                                sums["fliplr (lateral-axis)"])
    print(f"\nfliplr leaves the forward axis unchanged: "
          f"{'yes' if lateral_inert else 'NO (unexpected)'}")

    ok = (verdicts["flipud (forward-axis)"]
          and not verdicts["raw (no flip)"] and lateral_inert)
    if ok:
        print("✓ SUCCESS: flipud (and only a forward-axis flip) puts the "
              "vehicle mass in front — matches the loader's convention")
        return 0
    print("⚠ FAILURE: flip-convention verdicts do not match the "
          "documented flipud fix")
    return 1


if __name__ == "__main__":
    sys.exit(main())
