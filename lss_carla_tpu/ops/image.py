"""Image-space ops: ImageNet normalization and align_corners=True bilinear
resizing.

The reference's ``Up`` blocks use ``nn.Upsample(mode='bilinear',
align_corners=True)`` (reference ``src/models.py:19-20,108-110``), which is
NOT what ``jax.image.resize`` computes (jax implements the half-pixel /
align_corners=False convention only). We implement align_corners=True
interpolation as two small dense matmuls (separable along H and W) — the
interpolation matrices are compile-time constants and the contraction runs on
the MXU, which is faster on TPU than a gather-based formulation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

# ImageNet statistics (reference tools.py:160-171)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_img(img_u8: np.ndarray) -> np.ndarray:
    """uint8 (..., H, W, 3) -> float32 normalized, channels-last.

    Equivalent to the reference's ToTensor + Normalize(ImageNet)
    (tools.py:167-171) without the CHW transpose.
    """
    x = np.asarray(img_u8, dtype=np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_img(x: np.ndarray) -> np.ndarray:
    """Inverse of ``normalize_img``, to [0, 1] float (tools.py:147-164)."""
    return np.clip(np.asarray(x) * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)


@functools.lru_cache(maxsize=64)
def _align_corners_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) interpolation matrix, align_corners=True."""
    A = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1 or out_size == 1:
        # every output samples input position 0 (align_corners maps 0 -> 0)
        A[:, 0] = 1.0
        return A
    pos = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(pos).astype(np.int64)
    lo = np.minimum(lo, in_size - 2)
    w = (pos - lo).astype(np.float32)
    rows = np.arange(out_size)
    A[rows, lo] += 1.0 - w
    A[rows, lo + 1] += w
    return A


def resize_bilinear_align_corners(x: jnp.ndarray,
                                  out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear align_corners=True resize for NHWC tensors.

    x: (..., H, W, C) -> (..., out_h, out_w, C). Exactly matches
    ``torch.nn.functional.interpolate(mode='bilinear', align_corners=True)``.
    """
    H, W = x.shape[-3], x.shape[-2]
    out_h, out_w = out_hw
    if (H, W) == (out_h, out_w):
        return x
    Ah = jnp.asarray(_align_corners_matrix(H, out_h))
    Aw = jnp.asarray(_align_corners_matrix(W, out_w))
    x = jnp.einsum("oh,...hwc->...owc", Ah, x,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    x = jnp.einsum("pw,...hwc->...hpc", Aw, x,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return x


def upsample_align_corners(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Integer-scale align_corners=True bilinear upsample for NHWC tensors."""
    H, W = x.shape[-3], x.shape[-2]
    return resize_bilinear_align_corners(x, (H * scale, W * scale))
