"""Serving: AOT-export the jitted forward pass to a serialized artifact.

``export_predict`` captures the full camera->BEV forward (params baked in)
as a StableHLO artifact via ``jax.export``; ``load_predict`` restores a
callable from the file with no model code needed at load time. The artifact
is platform-checked by jax.export (export on the deployment platform, or
pass ``platforms``).

    from lss_carla_tpu.serving import export_predict, load_predict
    export_predict(model, state, "/models/lss.bin", bsz=1)
    predict = load_predict("/models/lss.bin")
    logits = predict(imgs, rots, trans, intrins, post_rots, post_trans)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _example_args(bsz: int, ncams: int, fH: int, fW: int,
                  img_dtype=jnp.float32):
    return (
        jnp.zeros((bsz, ncams, 3, fH, fW), img_dtype),
        jnp.zeros((bsz, ncams, 3, 3), jnp.float32),
        jnp.zeros((bsz, ncams, 3), jnp.float32),
        jnp.zeros((bsz, ncams, 3, 3), jnp.float32),
        jnp.zeros((bsz, ncams, 3, 3), jnp.float32),
        jnp.zeros((bsz, ncams, 3), jnp.float32),
    )


def export_predict(model, state, path: str, bsz: int = 1,
                   uint8_images: bool = False,
                   platforms: Optional[Sequence[str]] = None,
                   quantize: bool = False,
                   quant_min_channels: int = 64,
                   ncams: Optional[int] = None) -> None:
    """Serialize the forward pass (weights baked in) to ``path``.

    uint8_images: export with a uint8 image input signature (the
    device-normalize contract). platforms: e.g. ("tpu",) or ("cpu", "tpu");
    defaults to the current backend. quantize: bake int8 PTQ into the
    artifact (``ops/quant.py`` — the weight-quantization constants fold at
    export time since the params are closed over).
    """
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def fwd(imgs, rots, trans, intrins, post_rots, post_trans):
        if quantize:
            from lss_carla_tpu.ops.quant import quantized_apply
            return quantized_apply(model, variables, imgs, rots, trans,
                                   intrins, post_rots, post_trans,
                                   train=False,
                                   min_channels=quant_min_channels)
        return model.apply(variables, imgs, rots, trans, intrins, post_rots,
                           post_trans, train=False)

    fH, fW = model.data_aug_conf.final_dim
    # Ncams is the TRAIN-time camera-dropout count; eval/serving batches
    # carry the full rig (choose_cams returns all cameras when not
    # training), so a 5-cam nuScenes-recipe model still serves 6 cameras.
    # Override ncams explicitly for a different serving rig.
    if ncams is None:
        ncams = max(model.data_aug_conf.Ncams, 6)
    args = _example_args(bsz, ncams, fH, fW,
                         jnp.uint8 if uint8_images else jnp.float32)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    exported = jax_export.export(jax.jit(fwd), **kwargs)(*args)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_predict(path: str):
    """Load an exported artifact; returns callable(*6 inputs) -> logits."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return jax.jit(exported.call)


def _main():
    """CLI: trained checkpoint -> serving artifact (the export half of the
    serving workflow; ``python -m lss_carla_tpu.server`` serves it).

        python -m lss_carla_tpu.serving --checkpoint runs/x/ckpts --best \\
            --out /models/lss.bin [--ema] [--quantize] [--uint8] \\
            [--compute_dtype bfloat16] [--variant resnet18]
    """
    import argparse

    p = argparse.ArgumentParser(
        description="Export a trained checkpoint as an AOT serving artifact")
    p.add_argument("--checkpoint", required=True,
                   help="Orbax checkpoint directory (<logdir>/ckpts)")
    p.add_argument("--out", required=True, help="artifact output path")
    p.add_argument("--best", action="store_true",
                   help="export the best-by-val-IoU checkpoint")
    p.add_argument("--ema", action="store_true",
                   help="export the EMA params (runs trained with "
                        "--ema_decay); falls back to the raw params for "
                        "checkpoints without EMA state")
    p.add_argument("--quantize", action="store_true",
                   help="bake int8 PTQ convs into the artifact")
    p.add_argument("--uint8", action="store_true",
                   help="uint8 image inputs (device-normalize contract)")
    p.add_argument("--bsz", type=int, default=1)
    p.add_argument("--ncams", type=int, default=None,
                   help="serving camera count (default: full rig)")
    p.add_argument("--variant", default="b0",
                   choices=("b0", "b1", "b2", "b3", "b4",
                            "resnet18", "resnet34"))
    p.add_argument("--outC", type=int, default=1)
    p.add_argument("--compute_dtype", default="float32",
                   choices=("float32", "bfloat16"))
    p.add_argument("--H", type=int, default=224)
    p.add_argument("--W", type=int, default=480)
    p.add_argument("--final_dim", type=int, nargs=2, default=(128, 352))
    p.add_argument("--xbound", type=float, nargs=3,
                   default=(-50.0, 50.0, 0.5), metavar=("MIN", "MAX", "STEP"))
    p.add_argument("--ybound", type=float, nargs=3,
                   default=(-50.0, 50.0, 0.5), metavar=("MIN", "MAX", "STEP"))
    p.add_argument("--zbound", type=float, nargs=3,
                   default=(-10.0, 10.0, 20.0), metavar=("MIN", "MAX", "STEP"))
    p.add_argument("--dbound", type=float, nargs=3,
                   default=(4.0, 45.0, 1.0), metavar=("MIN", "MAX", "STEP"))
    p.add_argument("--platforms", nargs="*", default=None,
                   help='e.g. "tpu" or "cpu tpu" (default: current backend)')
    args = p.parse_args()

    from lss_carla_tpu.configs import DataAugConf, GridConf
    from lss_carla_tpu.models.lss import compile_model
    from lss_carla_tpu.training.state import (create_train_state,
                                              restore_train_state)
    from lss_carla_tpu.utils.checkpoint import CheckpointManager

    grid = GridConf(xbound=tuple(args.xbound), ybound=tuple(args.ybound),
                    zbound=tuple(args.zbound), dbound=tuple(args.dbound))
    aug = DataAugConf(H=args.H, W=args.W, final_dim=tuple(args.final_dim))
    model = compile_model(grid, aug, outC=args.outC, variant=args.variant,
                          compute_dtype=args.compute_dtype)
    fH, fW = aug.final_dim
    sample = _example_args(1, 6, fH, fW)
    state = create_train_state(model, jax.random.PRNGKey(0), sample,
                               ema_decay=1.0 if args.ema else 0.0)
    mgr = CheckpointManager(args.checkpoint)
    state, meta = restore_train_state(mgr, state, best=args.best,
                                      allow_weights_only=True)
    print(f"restored step={meta.get('counter')}"
          + (" (best)" if args.best else ""))
    if args.ema:
        state = state.replace(params=state.ema_params,
                              batch_stats=state.ema_batch_stats)
    export_predict(model, state, args.out, bsz=args.bsz,
                   uint8_images=args.uint8, platforms=args.platforms,
                   quantize=args.quantize, ncams=args.ncams)
    import os
    print(f"exported {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB, bsz {args.bsz}, "
          f"{args.compute_dtype}{', int8' if args.quantize else ''}"
          f"{', uint8-in' if args.uint8 else ''}"
          f"{', ema' if args.ema else ''})")


if __name__ == "__main__":
    _main()
