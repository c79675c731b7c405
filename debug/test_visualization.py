"""BEV visualization smoke test (reference ``debug/test_visualization.py``).

Runs an untrained model forward on one batch and renders both figure styles
— the reference's 1x3 GT/pred/overlay panel and this framework's 9-panel
training figure (``utils/viz.make_bev_figure``) — to PNG, checking value
ranges and shapes along the way.

    python debug/test_visualization.py [--dataroot ...] [--outdir debug_outputs]
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
    p.add_argument("--outdir", default="debug_outputs")
    args = p.parse_args()
    if args.dataroot is None:
        from lss_carla_tpu.data.fixtures import generate_fixture
        args.dataroot = generate_fixture(
            tempfile.mkdtemp(prefix="simbev_fixture_"), num_scenes=3,
            samples_per_scene=6, vehicle_x_range=(2.0, 35.0))
        print(f"using synthetic fixture at {args.dataroot}")

    gc, ac = GridConf(), DataAugConf(rand_flip=False)
    ds = SegmentationData(args.dataroot, is_train=True, data_aug_conf=ac,
                          grid_conf=gc)
    batch = next(iter(DataLoader(ds, batch_size=2, shuffle=False,
                                 num_workers=0)))

    print("running untrained model forward (one CPU compile)...")
    import jax
    # debug tooling runs on the host CPU: never grabs the (single-process)
    # TPU, and a local CPU compile beats a remote TPU compile for one forward
    jax.config.update("jax_platforms", "cpu")
    from lss_carla_tpu.models.lss import compile_model
    from lss_carla_tpu.training.state import create_train_state
    model = compile_model(gc, ac, outC=1)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               tuple(np.asarray(a[:1]) for a in batch[:6]))
    logits = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        *batch[:6], train=False)
    pred = np.asarray(jax.nn.sigmoid(logits))[0, 0]
    gt = np.asarray(batch[6][0, 0])

    print(f"  prediction shape: {logits.shape}  GT shape: {batch[6].shape}")
    print(f"  pred range: [{pred.min():.4f}, {pred.max():.4f}]")
    print(f"  GT range: [{gt.min():.4f}, {gt.max():.4f}]")
    assert pred.shape == gt.shape
    assert 0.0 <= pred.min() and pred.max() <= 1.0

    outdir = Path(args.outdir)
    outdir.mkdir(exist_ok=True)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # reference-style 1x3 panel
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].imshow(gt, cmap="gray", vmin=0, vmax=1, origin="lower")
    axes[0].set_title("Ground Truth BEV")
    axes[1].imshow(pred, cmap="gray", vmin=0, vmax=1, origin="lower")
    axes[1].set_title("Prediction BEV")
    overlay = np.zeros((*gt.shape, 3))
    overlay[..., 0], overlay[..., 1] = gt, pred
    axes[2].imshow(overlay, origin="lower")
    axes[2].set_title("Overlay (GT=Red, Pred=Green, Match=Yellow)")
    plt.tight_layout()
    path_a = outdir / "test_bev_visualization.png"
    plt.savefig(path_a, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"  saved: {path_a}")

    # framework 9-panel training figure (cameras + BEV + ego box)
    from lss_carla_tpu.utils.viz import make_bev_figure
    fig = make_bev_figure(np.asarray(batch[0][0]), gt, pred,
                          title="test_visualization (untrained)")
    path_b = outdir / "test_bev_visualization_full.png"
    fig.savefig(path_b, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"  saved: {path_b}")
    for path in (path_a, path_b):
        assert path.stat().st_size > 10_000, f"suspiciously small: {path}"

    print("✓ Visualization test completed successfully")
    return 0


if __name__ == "__main__":
    sys.exit(main())
