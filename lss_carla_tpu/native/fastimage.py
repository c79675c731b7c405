"""ctypes binding for the native JPEG decode+crop+normalize pipeline.

Builds ``libfastimage.so`` from ``fastimage.cpp`` on first use (cached beside
the source). Falls back cleanly: ``fastimage_available()`` is False when g++
or libjpeg is missing, and callers use the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from lss_carla_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastimage.cpp")
_SO = os.path.join(_HERE, "libfastimage.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_MEAN = np.ascontiguousarray(IMAGENET_MEAN, dtype=np.float32)
_INV_STD = np.ascontiguousarray(1.0 / IMAGENET_STD, dtype=np.float32)


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        try:
            return ctypes.CDLL(_SO)
        except OSError:
            # corrupt/foreign-built cache (-march=native is NOT portable
            # across hosts): rebuild below rather than crashing callers
            try:
                os.remove(_SO)
            except OSError:
                pass
    try:
        # unique tmp per process: two concurrent builders (trainer + tests)
        # truncating one shared tmp would install a corrupt .so
        tmp = f"{_SO}.tmp.{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-ljpeg", "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, _SO)
        return ctypes.CDLL(_SO)
    except (subprocess.CalledProcessError, OSError):
        _build_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            lib = _build()
            if lib is not None:
                lib.decode_crop_normalize.restype = ctypes.c_int
                lib.decode_crop_normalize.argtypes = [
                    ctypes.c_char_p, ctypes.c_long,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                ]
                lib.decode_crop_u8.restype = ctypes.c_int
                lib.decode_crop_u8.argtypes = [
                    ctypes.c_char_p, ctypes.c_long,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_ubyte),
                ]
                lib.jpeg_dims.restype = ctypes.c_int
                lib.jpeg_dims.argtypes = [
                    ctypes.c_char_p, ctypes.c_long,
                    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
                lib.decode_resize_crop_u8.restype = ctypes.c_int
                lib.decode_resize_crop_u8.argtypes = [
                    ctypes.c_char_p, ctypes.c_long,
                    ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_ubyte),
                ]
                lib.decode_resize_crop_normalize.restype = ctypes.c_int
                lib.decode_resize_crop_normalize.argtypes = [
                    ctypes.c_char_p, ctypes.c_long,
                    ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                ]
            _lib = lib
    return _lib


def fastimage_available() -> bool:
    return _get_lib() is not None


def jpeg_dims(data: bytes) -> Tuple[int, int]:
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("fastimage unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.jpeg_dims(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError("invalid JPEG")
    return w.value, h.value


def decode_crop_u8(data: bytes, crop: Tuple[int, int, int, int],
                   expected_dims: Optional[Tuple[int, int]] = None
                   ) -> np.ndarray:
    """JPEG bytes + crop box -> uint8 CHW array (3, b-t, r-l) — the
    normalize-on-device path (4x smaller host->device transfer).

    ``expected_dims`` (w, h): the decoded image must have exactly these
    dimensions (rc 3 otherwise). The crop-only kernel is PIL-equivalent
    only when the on-disk image already matches the configured size —
    callers pass the configured dims so a mismatched file falls back to a
    resizing path instead of silently cropping unresized pixels."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("fastimage unavailable")
    left, top, right, bottom = crop
    ew, eh = expected_dims if expected_dims is not None else (-1, -1)
    out_w, out_h = right - left, bottom - top
    out = np.empty((3, out_h, out_w), dtype=np.uint8)
    rc = lib.decode_crop_u8(
        data, len(data), left, top, out_w, out_h, ew, eh,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        raise ValueError(f"decode_crop_u8 failed (rc={rc})")
    return out


def decode_resize_crop_u8(data: bytes, resize_dims: Tuple[int, int],
                          crop: Tuple[int, int, int, int],
                          flip: bool = False) -> np.ndarray:
    """JPEG bytes -> PIL-convention bicubic resize to ``resize_dims``
    (w, h) -> crop (l, t, r, b in resized coords; may overhang the image —
    the overhang is zero-padded exactly like PIL's ``crop``) -> optional
    horizontal flip -> uint8 CHW array."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("fastimage unavailable")
    rw, rh = resize_dims
    left, top, right, bottom = crop
    out_w, out_h = right - left, bottom - top
    out = np.empty((3, out_h, out_w), dtype=np.uint8)
    rc = lib.decode_resize_crop_u8(
        data, len(data), rw, rh, left, top, out_w, out_h, int(flip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        raise ValueError(f"decode_resize_crop_u8 failed (rc={rc})")
    return out


def decode_resize_crop_normalize(data: bytes, resize_dims: Tuple[int, int],
                                 crop: Tuple[int, int, int, int],
                                 flip: bool = False) -> np.ndarray:
    """Like :func:`decode_resize_crop_u8` but ImageNet-normalized float32
    CHW (quantized to uint8 before normalize, matching the PIL path)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("fastimage unavailable")
    rw, rh = resize_dims
    left, top, right, bottom = crop
    out_w, out_h = right - left, bottom - top
    out = np.empty((3, out_h, out_w), dtype=np.float32)
    rc = lib.decode_resize_crop_normalize(
        data, len(data), rw, rh, left, top, out_w, out_h, int(flip),
        _MEAN.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _INV_STD.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"decode_resize_crop_normalize failed (rc={rc})")
    return out


def decode_crop_normalize(data: bytes, crop: Tuple[int, int, int, int],
                          expected_dims: Optional[Tuple[int, int]] = None
                          ) -> np.ndarray:
    """JPEG bytes + PIL-style crop box (l, t, r, b) -> normalized float32
    CHW array (3, b-t, r-l). Raises on bad input (caller falls back).
    ``expected_dims`` as in :func:`decode_crop_u8`."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("fastimage unavailable")
    left, top, right, bottom = crop
    ew, eh = expected_dims if expected_dims is not None else (-1, -1)
    out_w, out_h = right - left, bottom - top
    out = np.empty((3, out_h, out_w), dtype=np.float32)
    rc = lib.decode_crop_normalize(
        data, len(data), left, top, out_w, out_h, ew, eh,
        _MEAN.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _INV_STD.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"decode_crop_normalize failed (rc={rc})")
    return out
