"""Camera encoder: EfficientNet trunk + FPN fuse + depth-softmax lift.

Mirrors reference ``src/models.py:37-89``:
* trunk endpoints reduction_5 (stride 32) and reduction_4 (stride 16) fused
  by ``Up(.., 512)``;
* Dropout(0.2) then a 1x1 ``depthnet`` conv producing D + C channels;
* softmax over the D depth channels;
* outer product depth ⊗ features -> per-pixel (D, C) frustum features.

NHWC throughout; the lift returns (B*N, D, fH, fW, C) — channels last, so C
sits on the TPU lanes dimension for the downstream splat.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from lss_carla_tpu.models.efficientnet import EfficientNetTrunk
from lss_carla_tpu.models.layers import Dtype, Up
from lss_carla_tpu.models.resnet import ResNetTrunk


class CamEncode(nn.Module):
    D: int          # number of depth bins
    C: int          # lifted feature channels (camC = 64)
    variant: str = "b0"    # efficientnet b0..b4, or resnet18/resnet34
    dtype: Dtype = jnp.float32
    fused_dw: bool = False  # Pallas dwconv+BN fusion (EffNet train mode)

    @nn.compact
    def __call__(self, x, train: bool):
        """x: (B*N, fH*ds, fW*ds, 3) images -> (B*N, D, fH, fW, C)."""
        if self.variant.startswith("resnet"):
            trunk = ResNetTrunk(self.variant, name="trunk",
                                dtype=self.dtype)
        else:
            trunk = EfficientNetTrunk(self.variant, name="trunk",
                                      dtype=self.dtype,
                                      fused_dw=self.fused_dw)
        endpoints = trunk(x, train)
        x = Up(512, scale=2, name="up1", dtype=self.dtype)(
            endpoints["reduction_5"], endpoints["reduction_4"], train)
        x = nn.Dropout(0.2)(x, deterministic=not train)
        x = nn.Conv(self.D + self.C, (1, 1), name="depthnet",
                    dtype=self.dtype)(x)

        # softmax in f32 for stability, lift in compute dtype
        depth = nn.softmax(x[..., :self.D].astype(jnp.float32), axis=-1)
        depth = depth.astype(self.dtype)                   # (BN, fH, fW, D)
        feats = x[..., self.D:self.D + self.C]             # (BN, fH, fW, C)
        # outer product: (BN, fH, fW, D, 1) * (BN, fH, fW, 1, C)
        lifted = depth[..., :, None] * feats[..., None, :]
        # -> (BN, D, fH, fW, C)
        return lifted.transpose(0, 3, 1, 2, 4), depth
