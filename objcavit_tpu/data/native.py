"""ctypes binding for the native (C++) host-preprocessing core.

Loads csrc/libobjcavit_preprocess.so (built by `make -C csrc`; auto-built on
first use if a compiler is available). Every entry point has a pure-numpy
fallback so the framework runs without the native library — `native_available()`
reports which path is active.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libobjcavit_preprocess.so"))
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_CSRC)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as e:
            logger.info("native preprocess build unavailable (%s)", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.info("native preprocess load failed (%s)", e)
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    lib.rotate_bilinear_f32.argtypes = [f32p, f32p, i64, i64, i64, ctypes.c_float]
    lib.rotate_nearest_f32.argtypes = [f32p, f32p, i64, i64, i64, ctypes.c_float]
    lib.augment_normalize_f32.argtypes = [
        f32p, i64, i64, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, f32p, ctypes.c_int,
    ]
    lib.hflip_f32.argtypes = [f32p, i64, i64, i64]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rotate_bilinear(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """HWC float32, rotation about centre, zero fill."""
    lib = _load()
    if lib is None:
        from objcavit_tpu.data.preprocess import _rotate_bilinear_np

        return _rotate_bilinear_np(img, angle_deg)
    img = np.ascontiguousarray(img, np.float32)
    out = np.empty_like(img)
    h, w, c = img.shape
    lib.rotate_bilinear_f32(_ptr(img), _ptr(out), h, w, c, angle_deg)
    return out


def rotate_nearest(img: np.ndarray, angle_deg: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        from objcavit_tpu.data.preprocess import _rotate_nearest_np

        return _rotate_nearest_np(img, angle_deg)
    img = np.ascontiguousarray(img, np.float32)
    out = np.empty_like(img)
    h, w, c = img.shape
    lib.rotate_nearest_f32(_ptr(img), _ptr(out), h, w, c, angle_deg)
    return out


def augment_normalize(
    img: np.ndarray,
    flip: bool,
    do_augment: bool,
    gamma: float,
    brightness: float,
    color3: np.ndarray,
    do_normalize: bool = True,
) -> np.ndarray:
    """Fused legacy-train-tail over a HxWx3 [0,1] image; returns new array."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32).copy()
    if lib is None:
        from objcavit_tpu.data.preprocess import imagenet_normalize

        if flip:
            img = img[:, ::-1].copy()
        if do_augment:
            img = np.clip(
                (np.maximum(img, 0) ** gamma) * brightness * color3[None, None, :],
                0, 1,
            )
        return imagenet_normalize(img) if do_normalize else img
    c3 = np.ascontiguousarray(color3, np.float32)
    h, w, _ = img.shape
    lib.augment_normalize_f32(
        _ptr(img), h, w, int(flip), int(do_augment), float(gamma),
        float(brightness), _ptr(c3), int(do_normalize),
    )
    return img


def hflip(img: np.ndarray) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.float32).copy()
    if lib is None:
        return img[:, ::-1].copy()
    h, w, c = img.shape
    lib.hflip_f32(_ptr(img), h, w, c)
    return img
