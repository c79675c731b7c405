"""Pretrained-trunk effectiveness probe (TPU).

The reference's accuracy rests on starting from a pretrained EfficientNet
trunk (reference ``src/models.py:43``). Real ImageNet weights are not
reachable in this environment (zero egress), so this probe demonstrates the
same mechanism end-to-end with a transfer experiment:

1. pretrain: train LSS on fixture A (seed 0 scenes) and checkpoint;
2. probe: train two fresh runs on fixture B (DIFFERENT scenes, seed 1) with
   identical data/seeds — one from random init, one with
   ``pretrained_trunk=<phase-1 ckpt>`` (only the camera trunk transfers);
3. compare the early train-IoU trajectories.

A pretrained trunk must reach a given IoU in fewer steps than random init —
the curve pair is the evidence that the ``--pretrained_trunk`` path
delivers the reference's warm-start behavior.

    python scripts/pretrained_trunk_probe.py --pretrain_steps 500 \
        --probe_steps 200 --dtype bfloat16
"""

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def iou_curve(logdir):
    recs = [json.loads(l) for l in open(os.path.join(logdir, "metrics.jsonl"))]
    return [(r["step"], r["train/iou"]) for r in recs if "train/iou" in r]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrain_steps", type=int, default=500)
    p.add_argument("--probe_steps", type=int, default=200)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--bsz", type=int, default=8)
    p.add_argument("--workdir", default=None)
    args = p.parse_args()

    from lss_carla_tpu.data.fixtures import generate_fixture
    from lss_carla_tpu.training.loop import train

    work = Path(args.workdir or tempfile.mkdtemp(prefix="trunk_probe_"))
    print(f"workdir: {work}", flush=True)
    fix_a = generate_fixture(work / "fix_a", num_scenes=8,
                             samples_per_scene=24, seed=0)
    fix_b = generate_fixture(work / "fix_b", num_scenes=8,
                             samples_per_scene=24, seed=100)

    common = dict(nepochs=10_000, bsz=args.bsz, nworkers=8, lr=1e-3,
                  val_step=0, save_step=0, viz_step=0, iou_log_step=20,
                  compute_dtype=args.dtype, n_devices=1)

    print("=== phase 1: pretrain on fixture A ===", flush=True)
    train(dataroot=str(fix_a), logdir=str(work / "pretrain"),
          max_steps=args.pretrain_steps,
          **{**common, "save_step": args.pretrain_steps})
    ckpt = str(work / "pretrain" / "ckpts")

    print("=== phase 2: probe runs on fixture B ===", flush=True)
    for name, trunk in (("random", None), ("pretrained", ckpt)):
        train(dataroot=str(fix_b), logdir=str(work / f"probe_{name}"),
              max_steps=args.probe_steps, pretrained_trunk=trunk,
              seed=7, **common)

    print("\n=== early train-IoU trajectories (fixture B) ===")
    curves = {name: dict(iou_curve(str(work / f"probe_{name}")))
              for name in ("random", "pretrained")}
    steps = sorted(set(curves["random"]) | set(curves["pretrained"]))
    print(f"{'step':>6} {'random':>10} {'pretrained':>12}")
    for s in steps:
        print(f"{s:>6} {curves['random'].get(s, float('nan')):>10.4f} "
              f"{curves['pretrained'].get(s, float('nan')):>12.4f}")
    out = {"random": curves["random"], "pretrained": curves["pretrained"]}
    with open(work / "probe_result.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwritten: {work}/probe_result.json")


if __name__ == "__main__":
    main()
