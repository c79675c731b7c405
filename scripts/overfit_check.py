"""Learning-dynamics validation: overfit one fixture batch on the real chip.

The e2e smoke tests prove the step *runs*; this proves it *learns*: on a
physically consistent synthetic batch (cameras see red boxes where the BEV
label has vehicles), train IoU must climb well above zero within a few
hundred steps. This is the round-trip check on geometry + splat + label
conventions — a coordinate-frame bug would keep IoU pinned at ~0.

    python scripts/overfit_check.py [--steps 400] [--bsz 4]
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--bsz", type=int, default=4)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--target_iou", type=float, default=0.25)
    args = p.parse_args()

    from lss_carla_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    from lss_carla_tpu.configs import DataAugConf, GridConf
    from lss_carla_tpu.data.fixtures import generate_fixture
    from lss_carla_tpu.data.loader import DataLoader
    from lss_carla_tpu.data.simbev import SegmentationData
    from lss_carla_tpu.models.lss import compile_model
    from lss_carla_tpu.training.state import create_train_state
    from lss_carla_tpu.training.step import make_train_step

    root = generate_fixture(tempfile.mkdtemp(prefix="overfit_"),
                            num_scenes=2, samples_per_scene=4, H=224, W=480,
                            seed=3)
    ds = SegmentationData(root, is_train=True, data_aug_conf=DataAugConf(),
                          grid_conf=GridConf())
    dl = DataLoader(ds, batch_size=args.bsz, shuffle=False, drop_last=True,
                    num_workers=4)
    batch = jax.device_put(next(iter(dl)))

    model = compile_model(GridConf(), DataAugConf(), outC=1,
                          compute_dtype=args.dtype)
    state = create_train_state(model, jax.random.PRNGKey(0), batch[:6],
                               lr=args.lr)
    step = make_train_step(model, pos_weight=2.13)

    print(f"overfitting {args.bsz} samples for {args.steps} steps...")
    t0 = time.time()
    best_iou = 0.0
    for i in range(args.steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        if (i + 1) % args.log_every == 0:
            union = float(metrics["union"])
            iou = float(metrics["intersect"]) / union if union > 0 else 1.0
            best_iou = max(best_iou, iou)
            print(f"step {i+1}: loss={float(metrics['loss']):.4f} "
                  f"iou={iou:.4f}  ({(time.time()-t0)/(i+1)*1000:.1f} ms/step avg)")
    ok = best_iou >= args.target_iou
    print(f"{'PASS' if ok else 'FAIL'}: best train IoU {best_iou:.4f} "
          f"(target >= {args.target_iou})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
