"""Shared native-decode fast path for the dataset loaders.

Wraps the C++ fastimage kernels (``lss_carla_tpu/native``) behind one
object both the SimBEV and nuScenes datasets use: decode+resize+crop+flip
in native code (PIL-convention bicubic, parity within 1/255), bit-exact
crop-only kernel when no resize is needed, PIL fallback (returning None)
for anything the kernels don't cover — non-JPEG sources, arbitrary-angle
rotation, or a decode error (warned once).

The reference does all of this through PIL in DataLoader worker processes
(reference ``src/data_simbev.py:178``, ``src/tools.py:120-144``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class NativeDecoder:
    """Per-dataset handle on the native decode kernels.

    ``src_wh``: the on-disk image size ``(W, H)`` from the aug config —
    when ``resize_dims`` equals it (resize 1:1) and no flip is requested,
    the bit-exact crop-only kernel is used instead of the fused
    resize path.
    """

    def __init__(self, src_wh: Tuple[int, int], device_normalize: bool,
                 enabled: bool = True):
        self.src_wh = tuple(src_wh)
        self.device_normalize = device_normalize
        self._warned = False
        self.available = False
        if enabled:
            try:
                from lss_carla_tpu.native import fastimage_available
                self.available = fastimage_available()
            except Exception:
                self.available = False

    def decode(self, img_path, resize_dims, crop, flip,
               rotate) -> Optional[np.ndarray]:
        """CHW image (uint8 or normalized f32 per ``device_normalize``),
        or None when the caller must fall back to PIL."""
        if (not self.available or rotate != 0.0
                or img_path.suffix.lower() not in (".jpg", ".jpeg")):
            return None
        try:
            raw = img_path.read_bytes()
            if not flip and tuple(resize_dims) == self.src_wh:
                # bit-exact crop-only kernel; rc 3 (on-disk size differing
                # from the configured dims) raises -> PIL fallback
                from lss_carla_tpu.native import (decode_crop_normalize,
                                                  decode_crop_u8)
                return (decode_crop_u8(raw, crop, resize_dims)
                        if self.device_normalize
                        else decode_crop_normalize(raw, crop, resize_dims))
            from lss_carla_tpu.native import (decode_resize_crop_normalize,
                                              decode_resize_crop_u8)
            return (decode_resize_crop_u8(raw, resize_dims, crop, flip)
                    if self.device_normalize
                    else decode_resize_crop_normalize(raw, resize_dims,
                                                      crop, flip))
        except Exception as e:
            if not self._warned:
                # a systematic kernel failure would otherwise silently
                # halve loader throughput — surface the first occurrence
                self._warned = True
                print(f"fastimage fallback to PIL: {e!r} "
                      f"({img_path.name}; further falls are silent)")
            return None
