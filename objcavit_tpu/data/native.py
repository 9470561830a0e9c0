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
    pp = ctypes.POINTER(f32p)
    i64p = ctypes.POINTER(i64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.assemble_batch_f32.argtypes = [
        pp, pp, i64, i64p, i64p, i64, i64, i32p, i32p, i32p, i32p,
        f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, f32p, f32p,
    ]
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


def assemble_batch(
    images: list,
    depths: list,
    crops_yx: np.ndarray,  # (N, 2) int32 top-left corners
    flips: np.ndarray,  # (N,) bool
    do_augments: np.ndarray,  # (N,) bool
    gammas: np.ndarray,  # (N,) f32
    brightnesses: np.ndarray,  # (N,) f32
    colors3: np.ndarray,  # (N, 3) f32
    out_h: int,
    out_w: int,
    n_threads: int | None = None,
    do_normalize: bool = True,
):
    """Batch-level crop + legacy augment tail + stack, in C++ threads.

    images[i]: HxWx3 f32 [0,1] (post-rotate, pre-crop); depths[i]: HxWx1 f32
    metres. Returns (imgs (N,out_h,out_w,3), deps (N,out_h,out_w,1)) —
    bit-identical to the per-sample crop+augment_normalize+stack path.
    """
    lib = _load()
    n = len(images)
    if lib is None:
        outs_i, outs_d = [], []
        for i in range(n):
            y, x = int(crops_yx[i, 0]), int(crops_yx[i, 1])
            img = images[i][y : y + out_h, x : x + out_w]
            dep = depths[i][y : y + out_h, x : x + out_w]
            img = augment_normalize(
                img, bool(flips[i]), bool(do_augments[i]), float(gammas[i]),
                float(brightnesses[i]), colors3[i], do_normalize,
            )
            if flips[i]:
                dep = dep[:, ::-1].copy()
            outs_i.append(img)
            outs_d.append(dep)
        return np.stack(outs_i), np.stack(outs_d)

    import ctypes as ct

    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    images = [np.ascontiguousarray(a, np.float32) for a in images]
    depths = [np.ascontiguousarray(a, np.float32) for a in depths]
    img_ptrs = (ct.POINTER(ct.c_float) * n)(*[_ptr(a) for a in images])
    dep_ptrs = (ct.POINTER(ct.c_float) * n)(*[_ptr(a) for a in depths])
    hs = np.asarray([a.shape[0] for a in images], np.int64)
    ws = np.asarray([a.shape[1] for a in images], np.int64)
    crops = np.ascontiguousarray(crops_yx, np.int32)
    fl = np.ascontiguousarray(flips, np.int32)
    da = np.ascontiguousarray(do_augments, np.int32)
    gm = np.ascontiguousarray(gammas, np.float32)
    br = np.ascontiguousarray(brightnesses, np.float32)
    c3 = np.ascontiguousarray(colors3, np.float32)
    out_imgs = np.empty((n, out_h, out_w, 3), np.float32)
    out_deps = np.empty((n, out_h, out_w, 1), np.float32)
    lib.assemble_batch_f32(
        img_ptrs, dep_ptrs, n,
        hs.ctypes.data_as(ct.POINTER(ct.c_int64)),
        ws.ctypes.data_as(ct.POINTER(ct.c_int64)),
        out_h, out_w,
        np.ascontiguousarray(crops[:, 0]).ctypes.data_as(ct.POINTER(ct.c_int32)),
        np.ascontiguousarray(crops[:, 1]).ctypes.data_as(ct.POINTER(ct.c_int32)),
        fl.ctypes.data_as(ct.POINTER(ct.c_int32)),
        da.ctypes.data_as(ct.POINTER(ct.c_int32)),
        _ptr(gm), _ptr(br), _ptr(c3),
        int(do_normalize), int(n_threads), _ptr(out_imgs), _ptr(out_deps),
    )
    return out_imgs, out_deps
