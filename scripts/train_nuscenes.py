"""Original-LSS nuScenes training on TPU.

The reference keeps the upstream nuScenes entry points as dead code (broken
imports + devkit dependency, SURVEY §2.14-2.15). This script actually runs:
the exact original config — H=900 W=1600, resize_lim=(0.193, 0.225),
bot_pct_lim=(0.0, 0.22), rot_lim=(-5.4, 5.4), rand_flip=True, ncams=5
(reference ``src/train.py:23-43``) — on real nuScenes v1.0 tables via the
devkit-free loader (``lss_carla_tpu.data.nuscenes``), or on SimBEV-format
data with ``--simbev_data`` (BASELINE.json config 4).

    python scripts/train_nuscenes.py --dataroot /data/nuscenes
    python scripts/train_nuscenes.py --dataroot /data/SimBEV --simbev_data
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lss_carla_tpu.training.loop import train


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--nepochs", type=int, default=10000)
    p.add_argument("--bsz", type=int, default=16)
    p.add_argument("--nworkers", type=int, default=10)
    p.add_argument("--logdir", default="./runs/nuscenes_style")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-7)
    p.add_argument("--n_devices", type=int, default=None)
    p.add_argument("--cam_devices", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--version", default="v1.0-mini",
                   help="nuScenes table version directory")
    p.add_argument("--simbev_data", action="store_true",
                   help="run the nuScenes config against SimBEV-format data")
    p.add_argument("--host_normalize", action="store_true",
                   help="normalize images on the host (reference behavior) "
                        "instead of shipping uint8 and normalizing in-jit")
    # training extras (same semantics as train_simbev.py — the fast recipe
    # measured on SimBEV: bf16 + cosine + EMA with BN recalibration)
    p.add_argument("--lr_schedule", default="constant",
                   choices=["constant", "cosine", "linear"])
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--decay_steps", type=int, default=0)
    p.add_argument("--ema_decay", type=float, default=0.0)
    p.add_argument("--ema_bn_recal", type=int, default=16)
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--val_step", type=int, default=500)
    p.add_argument("--save_step", type=int, default=1000)
    p.add_argument("--watchdog_secs", type=int, default=0,
                   help="stall detector (tunnel hangs): stack dump at N s "
                        "of no step progress, hard-exit 42 at 2N")
    p.add_argument("--resume", default=None,
                   help="checkpoint dir to resume from (the supervisor "
                        "restart contract after a watchdog exit 42)")
    p.add_argument("--supervise", type=int, default=0,
                   help="restart up to N times on watchdog exit 42, "
                        "resuming from <logdir>/ckpts (pair with "
                        "--watchdog_secs)")
    args = p.parse_args()
    if args.supervise > 0:
        import sys
        from lss_carla_tpu.utils.supervise import run_supervised
        sys.exit(run_supervised(args.supervise, args.logdir))

    train(
        dataroot=args.dataroot,
        nepochs=args.nepochs,
        H=900, W=1600,
        resize_lim=(0.193, 0.225),
        final_dim=(128, 352),
        bot_pct_lim=(0.0, 0.22),
        rot_lim=(-5.4, 5.4),
        rand_flip=True,
        ncams=5,
        bsz=args.bsz,
        nworkers=args.nworkers,
        lr=args.lr,
        weight_decay=args.weight_decay,
        logdir=args.logdir,
        n_devices=args.n_devices,
        cam_devices=args.cam_devices,
        max_steps=args.max_steps,
        dataset="simbev" if args.simbev_data else "nuscenes",
        nuscenes_version=args.version,
        device_normalize=not args.host_normalize,
        lr_schedule=args.lr_schedule,
        warmup_steps=args.warmup_steps,
        decay_steps=args.decay_steps,
        ema_decay=args.ema_decay,
        ema_bn_recal=args.ema_bn_recal,
        compute_dtype=args.compute_dtype,
        seed=args.seed,
        val_step=args.val_step,
        save_step=args.save_step,
        watchdog_secs=args.watchdog_secs,
        resume=args.resume,
    )


if __name__ == "__main__":
    main()
