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
