"""Detailed coordinate-system verification — exact grid/label/model alignment
(reference ``debug/detailed_coordinate_check.py``).

Per sample: vehicle-pixel index ranges, their metric (ego-frame) positions,
and front/center judgments. Then the model's registered grid constants
(dx/bx/nx), an untrained forward pass shape check, and — with ``--save-fig``
— a six-panel figure of GT/pred/overlay plus the three "what if the
convention were wrong" variants (fliplr / flipud / transpose).

Index mapping under THIS framework's convention (docs/COORDINATES.md):
loaded grids are (X, Y)-indexed — dim0 (rows) is ego X (forward), dim1
(cols) is ego Y (left). The reference stores the transpose; judgments below
are identical, axes swapped.

    python debug/detailed_coordinate_check.py [--dataroot ...] [--samples 5]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default=None)
    p.add_argument("--samples", type=int, default=5)
    p.add_argument("--save-fig", default=None)
    p.add_argument("--skip-model", action="store_true",
                   help="label checks only (no jax compile)")
    args = p.parse_args()
    if args.dataroot is None:
        from lss_carla_tpu.data.fixtures import generate_fixture
        args.dataroot = generate_fixture(
            tempfile.mkdtemp(prefix="simbev_fixture_"), num_scenes=3,
            samples_per_scene=6, vehicle_x_range=(2.0, 35.0))
        print(f"using forward-biased synthetic fixture at {args.dataroot}")

    gc, ac = GridConf(), DataAugConf(rand_flip=False)  # no augmentation
    ds = SegmentationData(args.dataroot, is_train=True, data_aug_conf=ac,
                          grid_conf=gc)
    dl = DataLoader(ds, batch_size=1, shuffle=False, num_workers=0)

    dxm, x_min, y_min = gc.xbound[2], gc.xbound[0], gc.ybound[0]
    ok = True

    print("=" * 70)
    print("1. Label positions in metric ego coordinates")
    print("=" * 70)
    it = iter(dl)
    batch = None
    if args.samples <= 0:
        raise SystemExit("--samples must be >= 1")
    for si in range(args.samples):
        nxt = next(it, None)
        if nxt is None:
            if batch is None:
                raise SystemExit("dataset is empty — nothing to check")
            break  # fewer batches than --samples: stop, don't re-count
        batch = nxt
        gt = np.asarray(batch[6][0, 0])
        ii, jj = np.nonzero(gt > 0.5)  # dim0 = ego X (fwd), dim1 = ego Y
        if len(ii) == 0:
            print(f"  sample {si}: no vehicles, skipping")
            continue
        x_m = ii * dxm + x_min + dxm / 2
        y_m = jj * dxm + y_min + dxm / 2
        print(f"  sample {si}: {len(ii)} vehicle px  "
              f"rows [{ii.min()},{ii.max()}] cols [{jj.min()},{jj.max()}]  "
              f"X(fwd) [{x_m.min():.1f},{x_m.max():.1f}]m  "
              f"Y(left) [{y_m.min():.1f},{y_m.max():.1f}]m  "
              f"mean X={x_m.mean():.1f} Y={y_m.mean():.1f}")
        front_ok = x_m.mean() > 0
        center_ok = abs(y_m.mean()) <= 30
        ok &= front_ok
        print(f"    {'✓' if front_ok else '⚠'} vehicles "
              f"{'in FRONT of' if front_ok else 'BEHIND'} ego   "
              f"{'✓' if center_ok else '⚠'} "
              f"{'near' if center_ok else 'far from'} center lane")

    print()
    print("=" * 70)
    print("2. Explicit index mapping (this framework's (X, Y) convention)")
    print("=" * 70)
    gt = np.asarray(batch[6][0, 0])
    c = (gt.shape[0] - 1) / 2
    print(f"  grid {gt.shape}; ego (X=0, Y=0) -> index "
          f"[{c:.1f}, {c:.1f}]; GT there = {gt[int(c), int(c)]:.3f}")
    print(f"  row 0 -> X={x_min:+.0f} m (back),  row {gt.shape[0]-1} -> "
          f"X={gc.xbound[1]:+.0f} m (front)")
    print(f"  col 0 -> Y={y_min:+.0f} m (right), col {gt.shape[1]-1} -> "
          f"Y={gc.ybound[1]:+.0f} m (left)")

    pred = None
    if not args.skip_model:
        print()
        print("=" * 70)
        print("3. Model grid constants + untrained forward")
        print("=" * 70)
        import jax
        # debug tooling runs on the host CPU: never grabs the (single-
        # process) TPU, and a local CPU compile beats a remote TPU compile
        # for a one-shot forward
        jax.config.update("jax_platforms", "cpu")
        from lss_carla_tpu.models.lss import compile_model
        from lss_carla_tpu.training.state import create_train_state
        model = compile_model(gc, ac, outC=1)
        print(f"  model dx: {model.grid_conf.dx}")
        print(f"  model bx: {model.grid_conf.bx}")
        print(f"  model nx: {model.grid_conf.nx}")
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            tuple(np.asarray(a[:1]) for a in batch[:6]))
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            *batch[:6], train=False)
        pred = np.asarray(jax.nn.sigmoid(logits))[0, 0]
        shape_ok = pred.shape == gt.shape
        ok &= shape_ok
        print(f"  {'✓' if shape_ok else '⚠'} prediction shape {pred.shape} "
              f"vs GT {gt.shape}")

    if args.save_fig:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(2, 3, figsize=(18, 12))
        extent = [y_min, gc.ybound[1], x_min, gc.xbound[1]]
        panels = [(gt, "Ground Truth"),
                  (pred if pred is not None else np.zeros_like(gt),
                   "Model Prediction (untrained)")]
        overlay = np.zeros((*gt.shape, 3))
        overlay[..., 0] = gt
        if pred is not None:
            overlay[..., 1] = pred
        panels.append((overlay, "Overlay (Red=GT, Green=Pred)"))
        panels += [(np.fliplr(gt), "GT fliplr (if Y were mirrored)"),
                   (np.flipud(gt), "GT flipud (if X were mirrored)"),
                   (gt.T, "GT transposed (if X/Y were swapped)")]
        for ax, (img, title) in zip(axes.flat, panels):
            if img.ndim == 2:
                ax.imshow(img, cmap="hot", vmin=0, vmax=1, origin="lower",
                          extent=extent)
            else:
                ax.imshow(img, origin="lower", extent=extent)
            ax.set_title(title, fontsize=12, fontweight="bold")
            ax.set_xlabel("Y (m)")
            ax.set_ylabel("X (m, forward)")
            ax.axhline(y=0, color="white", ls="--", lw=1, alpha=0.7)
            ax.axvline(x=0, color="white", ls="--", lw=1, alpha=0.7)
            ax.grid(True, alpha=0.3, color="white")
        plt.tight_layout()
        plt.savefig(args.save_fig, dpi=120, bbox_inches="tight")
        print(f"\nsaved: {args.save_fig}")

    print()
    if ok:
        print("✓ Coordinate system appears CORRECT (vehicle mass forward, "
              "shapes aligned)")
        return 0
    print("⚠ CRITICAL: coordinate check FAILED — see panels/solutions in "
          "docs/COORDINATES.md")
    return 1


if __name__ == "__main__":
    sys.exit(main())
