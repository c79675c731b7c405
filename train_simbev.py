"""Training CLI for the TPU-native LSS engine on SimBEV.

Mirrors the reference CLI flag-for-flag (reference ``train_simbev.py:463-538``)
and adds TPU-native flags (--n_devices, --splat_method, --variant,
--max_steps, --profile_dir).

    python train_simbev.py --dataroot /data/SimBEV --bsz 8 --nworkers 8
"""

import argparse

from lss_carla_tpu.training.loop import train


def main():
    parser = argparse.ArgumentParser(description="Train LSS on SimBEV (TPU)")

    parser.add_argument('--dataroot', type=str, required=True,
                        help='Path to SimBEV dataset root directory')
    parser.add_argument('--nepochs', type=int, default=100)
    parser.add_argument('--gpuid', type=int, default=0,
                        help='ignored (TPU build; kept for CLI compatibility)')
    parser.add_argument('--bsz', type=int, default=4)
    parser.add_argument('--nworkers', type=int, default=4)
    parser.add_argument('--lr', type=float, default=1e-3)
    parser.add_argument('--weight_decay', type=float, default=1e-7)

    parser.add_argument('--H', type=int, default=224)
    parser.add_argument('--W', type=int, default=480)
    parser.add_argument('--final_h', type=int, default=128)
    parser.add_argument('--final_w', type=int, default=352)
    parser.add_argument('--ncams', type=int, default=6)

    # BEV grid bounds (train() kwargs in the reference; exposed as flags so
    # the stretch configs are drivable from the CLI)
    parser.add_argument('--xbound', type=float, nargs=3,
                        default=(-50.0, 50.0, 0.5),
                        metavar=('MIN', 'MAX', 'STEP'))
    parser.add_argument('--ybound', type=float, nargs=3,
                        default=(-50.0, 50.0, 0.5),
                        metavar=('MIN', 'MAX', 'STEP'))
    parser.add_argument('--zbound', type=float, nargs=3,
                        default=(-10.0, 10.0, 20.0),
                        metavar=('MIN', 'MAX', 'STEP'))
    parser.add_argument('--dbound', type=float, nargs=3,
                        default=(4.0, 45.0, 1.0),
                        metavar=('MIN', 'MAX', 'STEP'))

    parser.add_argument('--logdir', type=str, default='./runs/simbev')
    parser.add_argument('--val_step', type=int, default=500)
    parser.add_argument('--save_step', type=int, default=1000)
    parser.add_argument('--viz_step', type=int, default=100,
                        help='training-figure cadence (0 disables viz)')
    # augmentation (train() kwargs in the reference, exposed here as flags;
    # defaults = reference SimBEV defaults, which DISABLE augmentation).
    # NOTE the val loader always resizes to max(fH/H, fW/W) (~0.733 at the
    # default dims) while the train default is scale 1.0 — pass a
    # --resize_lim bracketing the val scale (e.g. 0.70 0.85, the upstream
    # LSS nuScenes recipe) to train a scale-robust depth head.
    parser.add_argument('--resize_lim', type=float, nargs=2,
                        default=(1.0, 1.0))
    parser.add_argument('--bot_pct_lim', type=float, nargs=2,
                        default=(0.0, 0.0))
    parser.add_argument('--rot_lim', type=float, nargs=2,
                        default=(0.0, 0.0))
    parser.add_argument('--rand_flip', action='store_true', default=False)
    parser.add_argument('--resume', type=str, default=None)
    parser.add_argument('--pretrained_trunk', type=str, default=None,
                        help='ImageNet-pretrained EfficientNet trunk: path '
                             'to an efficientnet_pytorch .pth, a reference '
                             'LSS .pt, an Orbax ckpt dir, or "auto" to '
                             'search the torch hub cache (the reference '
                             'downloads these at src/models.py:43)')

    parser.add_argument('--use_wandb', action='store_true', default=False)
    parser.add_argument('--wandb_project', type=str, default='lift-splat-shoot')
    parser.add_argument('--wandb_name', type=str, default=None)
    parser.add_argument('--wandb_entity', type=str, default=None)

    # TPU-native extras
    parser.add_argument('--n_devices', type=int, default=None,
                        help='number of chips for data parallelism (default all)')
    parser.add_argument('--lr_schedule', type=str, default='constant',
                        choices=['constant', 'cosine', 'linear'],
                        help='learning-rate schedule (reference parity: '
                             'constant); warmup applies to all')
    parser.add_argument('--warmup_steps', type=int, default=0)
    parser.add_argument('--decay_steps', type=int, default=0,
                        help='schedule horizon in steps (0 = auto: '
                             'nepochs x steps/epoch)')
    parser.add_argument('--accum_steps', type=int, default=1,
                        help='>1: gradient accumulation — each optimizer '
                             'step scans N loader batches (effective batch '
                             'bsz*N) with one update')
    parser.add_argument('--ema_decay', type=float, default=0.0,
                        help='>0 (e.g. 0.999): keep an exponential moving '
                             'average of the params; validation/best-IoU '
                             'use the averaged model')
    parser.add_argument('--ema_bn_recal', type=int, default=16,
                        help='batches of SWA-style BN-stat recalibration '
                             'before each EMA validation (0 = off; '
                             'measured load-bearing, docs/ACCURACY.md)')
    parser.add_argument('--cam_devices', type=int, default=1,
                        help='camera-axis model-parallel shards: splits the '
                             'cameras over a 2-D (data, cam) mesh; '
                             'n_devices/cam_devices become batch shards')
    parser.add_argument('--grid_devices', type=int, default=1,
                        help='BEV-grid spatial shards: splits the grid X '
                             'axis over a 2-D (data, grid) GSPMD mesh (for '
                             'large grids, e.g. the 400x400 stretch config); '
                             'n_devices/grid_devices become batch shards')
    parser.add_argument('--multihost', action='store_true',
                        help='multi-controller run: launch this CLI once '
                             'per host of a pod; initializes '
                             'jax.distributed, shards input loading per '
                             'host, logs on process 0. --bsz is the GLOBAL '
                             'batch size')
    parser.add_argument('--splat_method', type=str, default='scatter',
                        choices=['scatter', 'sorted', 'pallas'])
    parser.add_argument('--compute_dtype', type=str, default='float32',
                        choices=['float32', 'bfloat16'])
    parser.add_argument('--pos_weight', type=float, nargs='+',
                        default=[2.13],
                        help='BCE positive-class weight (reference: 2.13). '
                             'One value, or one per class for multiclass '
                             'heads (torch pos_weight-tensor semantics) — '
                             'sparse classes need larger weights to not be '
                             'drowned by dense ones')
    parser.add_argument('--label_mode', type=str, default='vehicle_binary',
                        choices=['vehicle_binary', 'multiclass'])
    parser.add_argument('--label_classes', type=int, nargs='+',
                        default=[0, 1, 2, 3],
                        help='BEV channels for --label_mode multiclass')
    parser.add_argument('--extrinsic_noise', type=float, nargs=2,
                        default=None, metavar=('ROT_DEG_STD', 'TRANS_M_STD'),
                        help='train-time extrinsic perturbation')
    parser.add_argument('--host_normalize', action='store_true',
                        help='normalize images on the host (reference '
                             'behavior) instead of in the jitted program')
    parser.add_argument('--variant', type=str, default='b0',
                        choices=['b0', 'b1', 'b2', 'b3', 'b4',
                                 'resnet18', 'resnet34'],
                        help='camera trunk: efficientnet (reference parity) '
                             'or the MXU-friendly resnet alternative')
    parser.add_argument('--fused_dw', action='store_true',
                        help='Pallas fused depthwise-conv+BN-stats in the '
                             'EffNet train path (ops/mbconv_pallas.py). '
                             'Measured SLOWER than XLA on v5e (54.7 vs '
                             '38.3 ms bf16 step — docs/ROADMAP.md 2b kill-'
                             'memo); kept as a working Mosaic conv-kernel '
                             'example. DP meshes only.')
    parser.add_argument('--max_steps', type=int, default=None)
    parser.add_argument('--debug_stall_at', type=int, default=0,
                        help='TESTING ONLY: freeze the step loop at this '
                             'step to drill the watchdog/supervisor chain '
                             'on hardware (pick a step after the first '
                             '--save_step so the restart can --resume)')
    parser.add_argument('--watchdog_secs', type=int, default=0,
                        help='stall detector: dump stacks after N s of no '
                             'step progress, hard-exit (code 42) at 2N for '
                             'supervisor restart with --resume; 0 disables')
    parser.add_argument('--async_save', action='store_true',
                        help='persist periodic checkpoints in a background '
                             'thread (training overlaps the write); best/'
                             'final/preemption saves stay durable')
    parser.add_argument('--profile_dir', type=str, default=None)
    parser.add_argument('--seed', type=int, default=42)
    parser.add_argument('--supervise', type=int, default=0,
                        help='restart the run up to N times on a watchdog '
                             'hard-exit (code 42), resuming from '
                             '<logdir>/ckpts once a checkpoint exists — '
                             'the in-CLI version of the bash retry loop '
                             'for hung remote transports (pair with '
                             '--watchdog_secs)')

    args = parser.parse_args()
    if args.supervise > 0:
        import sys
        from lss_carla_tpu.utils.supervise import run_supervised
        sys.exit(run_supervised(args.supervise, args.logdir))
    train(
        dataroot=args.dataroot,
        nepochs=args.nepochs,
        H=args.H,
        W=args.W,
        final_dim=(args.final_h, args.final_w),
        ncams=args.ncams,
        bsz=args.bsz,
        nworkers=args.nworkers,
        lr=args.lr,
        weight_decay=args.weight_decay,
        logdir=args.logdir,
        val_step=args.val_step,
        save_step=args.save_step,
        viz_step=args.viz_step,
        resize_lim=tuple(args.resize_lim),
        bot_pct_lim=tuple(args.bot_pct_lim),
        rot_lim=tuple(args.rot_lim),
        rand_flip=args.rand_flip,
        xbound=tuple(args.xbound),
        ybound=tuple(args.ybound),
        zbound=tuple(args.zbound),
        dbound=tuple(args.dbound),
        resume=args.resume,
        pretrained_trunk=args.pretrained_trunk,
        use_wandb=args.use_wandb,
        wandb_project=args.wandb_project,
        wandb_name=args.wandb_name,
        wandb_entity=args.wandb_entity,
        n_devices=args.n_devices,
        multihost=args.multihost,
        cam_devices=args.cam_devices,
        grid_devices=args.grid_devices,
        lr_schedule=args.lr_schedule,
        warmup_steps=args.warmup_steps,
        decay_steps=args.decay_steps,
        ema_decay=args.ema_decay,
        ema_bn_recal=args.ema_bn_recal,
        accum_steps=args.accum_steps,
        splat_method=args.splat_method,
        compute_dtype=args.compute_dtype,
        pos_weight=tuple(args.pos_weight),
        label_mode=args.label_mode,
        label_classes=tuple(args.label_classes),
        extrinsic_noise=(tuple(args.extrinsic_noise)
                         if args.extrinsic_noise else None),
        device_normalize=not args.host_normalize,
        variant=args.variant,
        fused_dw=args.fused_dw,
        max_steps=args.max_steps,
        profile_dir=args.profile_dir,
        debug_stall_at=args.debug_stall_at,
        watchdog_secs=args.watchdog_secs,
        async_save=args.async_save,
        seed=args.seed,
    )


if __name__ == '__main__':
    main()
