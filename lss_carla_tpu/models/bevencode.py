"""BEV encoder: ResNet-18-style trunk + upsampling decoder.

Mirrors reference ``src/models.py:92-130``:
* conv7x7 stride 2 (inC -> 64) + BN + ReLU;
* resnet18 layer1 (2x BasicBlock 64), layer2 (2x 128, stride 2),
  layer3 (2x 256, stride 2) with zero-init residual BN;
* ``Up(64+256, 256, scale=4)`` skip fuse from layer1;
* Dropout2d(0.1);
* upsample x2 (align_corners) + conv3x3(128) + BN + ReLU + conv1x1(outC).

Input/output are NHWC: (B, X, Y, inC) -> (B, X, Y, outC) logits.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from lss_carla_tpu.models.layers import (
    BasicBlock, ConvBNReLU, Dropout2d, Dtype, Up, kaiming_out, torch_pad)
from lss_carla_tpu.ops.image import upsample_align_corners


class BevEncode(nn.Module):
    outC: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=torch_pad(7),
                    use_bias=False, kernel_init=kaiming_out, name="conv1",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1", dtype=self.dtype)(x)
        x = nn.relu(x)

        d = self.dtype
        x1 = BasicBlock(64, name="layer1_0", dtype=d)(x, train)
        x1 = BasicBlock(64, name="layer1_1", dtype=d)(x1, train)
        x = BasicBlock(128, stride=2, name="layer2_0", dtype=d)(x1, train)
        x = BasicBlock(128, name="layer2_1", dtype=d)(x, train)
        x = BasicBlock(256, stride=2, name="layer3_0", dtype=d)(x, train)
        x = BasicBlock(256, name="layer3_1", dtype=d)(x, train)

        x = Up(256, scale=4, name="up1", dtype=d)(x, x1, train)
        x = Dropout2d(0.1)(x, deterministic=not train)

        x = upsample_align_corners(x, 2)
        x = ConvBNReLU(128, name="up2_conv", dtype=d)(x, train)
        # head + logits always f32
        x = nn.Conv(self.outC, (1, 1), name="head")(x.astype(jnp.float32))
        return x
