"""Instance-mask assembly from YOLO prototypes (yolov7-seg process_mask).

masks = sigmoid(proto @ coeffs^T), cropped to each detection's box and
bilinearly upsampled to image resolution — referenced by Yolov7Wrapper.py:107.
Fixed shapes: always N_MAX masks; invalid slots produce all-zero masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from objcavit_tpu.ops.resize import resize_bilinear


def process_masks(
    proto: jax.Array,  # (hp, wp, nm) prototypes (image /4 resolution)
    coeffs: jax.Array,  # (N, nm) per-detection mask coefficients
    boxes_xyxy: jax.Array,  # (N, 4) in image pixels
    valid: jax.Array,  # (N,) bool
    image_hw: tuple[int, int],
    upsample: bool = True,
) -> jax.Array:
    """Returns (N, H, W) float masks in [0, 1] (or (N, hp, wp) if not
    upsampled — boxes are cropped in prototype space either way)."""
    hp, wp, nm = proto.shape
    h, w = image_hw
    m = jax.nn.sigmoid(
        jnp.einsum("hwc,nc->nhw", proto, coeffs, preferred_element_type=jnp.float32)
    )
    # crop to boxes in prototype coordinate space
    sx, sy = wp / w, hp / h
    x1 = boxes_xyxy[:, 0] * sx
    y1 = boxes_xyxy[:, 1] * sy
    x2 = boxes_xyxy[:, 2] * sx
    y2 = boxes_xyxy[:, 3] * sy
    cols = jnp.arange(wp, dtype=jnp.float32)[None, None, :]
    rows = jnp.arange(hp, dtype=jnp.float32)[None, :, None]
    inside = (
        (cols >= x1[:, None, None])
        & (cols < x2[:, None, None])
        & (rows >= y1[:, None, None])
        & (rows < y2[:, None, None])
    )
    m = m * inside * valid[:, None, None]
    if upsample:
        m = resize_bilinear(m[..., None], h, w, align_corners=False)[..., 0]
    return m
