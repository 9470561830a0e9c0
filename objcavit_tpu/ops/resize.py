"""Bilinear resize with exact PyTorch semantics, as separable matmuls.

The reference uses ``torch.nn.functional.interpolate(mode='bilinear')`` in three
places that matter for numeric parity (see /root/reference):
  * decoder skip-upsampling with ``align_corners=True``   (DenseFeatureExtractor.py:44)
  * SILog loss upsample with ``align_corners=True``       (losses/SILogLoss.py:47)
  * metrics upsample with ``align_corners=True``          (metrics/MetricsPreprocess.py:17)

``jax.image.resize`` implements neither of torch's two coordinate conventions
exactly, so we build the interpolation explicitly. For static shapes (always
true under jit) a 1-D bilinear resize is a sparse band matrix; applying it as a
dense matmul along H then W keeps the whole op on the MXU and makes the VJP a
transposed matmul — both faster and exactly torch-matching.

Layout: NHWC (TPU-native).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    if align_corners:
        if out_size == 1:
            # torch maps the single output pixel to source coord 0
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    m[np.arange(out_size), lo] += (1.0 - frac).astype(np.float32)
    m[np.arange(out_size), hi] += frac.astype(np.float32)
    return m


@functools.lru_cache(maxsize=128)
def _interp_taps(in_size: int, out_size: int, align_corners: bool):
    """(lo_idx, hi_idx, frac) numpy taps for 1-D bilinear interpolation."""
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


def resize_bilinear(
    x: jax.Array,
    out_h: int,
    out_w: int,
    align_corners: bool = True,
    precision=None,
) -> jax.Array:
    """Bilinear-resize NHWC ``x`` to (out_h, out_w) with torch semantics.

    ``align_corners=True`` matches ``F.interpolate(..., mode='bilinear',
    align_corners=True)``; ``False`` matches torch's default half-pixel mode.

    Implemented as separable dense interpolation-matrix matmuls: despite the
    O(H^2 W C) FLOP count this rides the MXU and measures *faster* on TPU
    than the O(HWC) gather+lerp formulation (gathers don't vectorise well on
    TPU; measured 177 vs 147 img/s on the flagship forward).

    precision: None -> fp32-exact (Precision.HIGHEST), for parity-critical
    eval/loss paths. Pass jax.lax.Precision.DEFAULT/HIGH inside bf16 model
    code where interpolation-weight rounding is acceptable.
    """
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    if precision is None:
        # parity-critical path: fp32 passes, exact interpolation weights
        prec = jax.lax.Precision.HIGHEST
        xf = x.astype(jnp.float32)
    else:
        # declared-fast path (bf16 decoder): materialise the passes in the
        # input dtype — the fp32 upcast DOUBLED the HBM traffic of the
        # decoder's biggest bandwidth op (measured: up-stage resizes run at
        # 0.6-3.3%% MFU, docs/PERF.md). MXU still accumulates in fp32.
        prec = precision
        xf = x
    if h != out_h:
        mh = jnp.asarray(_interp_matrix(h, out_h, align_corners), xf.dtype)
        # (out_h, h) @ (n, h, w*c) -> (n, out_h, w*c)
        xf = jnp.einsum(
            "oh,nhk->nok", mh, xf.reshape(n, h, w * c), precision=prec
        ).reshape(n, out_h, w, c)
    if w != out_w:
        mw = jnp.asarray(_interp_matrix(w, out_w, align_corners), xf.dtype)
        xf = jnp.einsum("ow,nhwc->nhoc", mw, xf, precision=prec)
    return xf.astype(dtype)
