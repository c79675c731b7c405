"""Shared Flax building blocks (NHWC, TPU-friendly).

Parity notes vs the reference (PyTorch):

* All tensors are channels-last (NHWC) — the natural TPU layout (lanes = C).
* ``nn.BatchNorm`` momentum convention differs from torch:
  flax ``momentum`` = 1 - torch ``momentum``.
* ``Up`` mirrors reference ``src/models.py:15-34``: align_corners=True
  bilinear upsample, concat [skip, upsampled] on channels, then
  2x (conv3x3 no-bias + BN + ReLU).
* Convolutions use explicit torch-style symmetric padding (k//2), which for
  stride-2 even inputs differs from XLA 'SAME' by one pixel of alignment.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

from lss_carla_tpu.ops.image import upsample_align_corners

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu')
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def torch_pad(k: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Symmetric k//2 padding, matching torch Conv2d(padding=k//2)."""
    p = k // 2
    return ((p, p), (p, p))


class ConvBNReLU(nn.Module):
    """conv(kxk, no bias) + BN + ReLU, torch-style padding."""
    features: int
    kernel: int = 3
    stride: int = 1
    bn_momentum: float = 0.9   # torch default 0.1
    bn_epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=torch_pad(self.kernel), use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum,
                         epsilon=self.bn_epsilon, dtype=self.dtype)(x)
        return nn.relu(x)


class Up(nn.Module):
    """Upsample-and-fuse block (reference ``src/models.py:15-34``).

    ``__call__(x1, x2)``: bilinear-upsample x1 by ``scale`` (align_corners),
    concat [x2, x1] on channels, then two ConvBNReLUs to ``features``.
    """
    features: int
    scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool):
        x1 = upsample_align_corners(x1, self.scale)
        x = jnp.concatenate([x2, x1], axis=-1)
        x = ConvBNReLU(self.features, dtype=self.dtype)(x, train)
        x = ConvBNReLU(self.features, dtype=self.dtype)(x, train)
        return x


class BasicBlock(nn.Module):
    """torchvision resnet BasicBlock with zero-init residual BN."""
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=torch_pad(3), use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=torch_pad(3), use_bias=False,
                    kernel_init=kaiming_out, dtype=self.dtype)(y)
        # zero_init_residual=True (reference models.py:96): scale starts at 0
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=nn.initializers.zeros,
                         dtype=self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=kaiming_out,
                               name="downsample_conv", dtype=self.dtype)(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, name="downsample_bn",
                                    dtype=self.dtype)(identity)
        return nn.relu(y + identity)


class Dropout2d(nn.Module):
    """Channel dropout (torch nn.Dropout2d): zeroes whole feature maps."""
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        # broadcast over H, W so an entire channel is kept or dropped
        return nn.Dropout(self.rate, broadcast_dims=(1, 2))(
            x, deterministic=deterministic)
