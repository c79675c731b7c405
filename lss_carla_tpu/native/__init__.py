"""Native (C++) host-pipeline components, loaded via ctypes.

The library builds lazily on first use (g++ + system libjpeg) and caches the
.so next to the source. Everything here is optional: callers fall back to
the pure-Python path when the toolchain or libjpeg is unavailable.
"""

from lss_carla_tpu.native.fastimage import (  # noqa: F401
    decode_crop_normalize, decode_crop_u8, decode_resize_crop_normalize,
    decode_resize_crop_u8, fastimage_available, jpeg_dims)
