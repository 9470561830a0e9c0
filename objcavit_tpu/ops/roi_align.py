"""Position-sensitive ROI-align (1x1 output), torchvision-parity, fixed shapes.

The reference's ``grid_random_roi_align`` positional-embedding strategy calls
``torchvision.ops.ps_roi_align(..., output_size=[1, 1])`` on a learned
embedding grid (modules/ObjCAViT.py:128,144). With a 1x1 output and C channels
the position-sensitive pooling degenerates to plain ROI-align with a single
bin: the average of bilinear samples on a ceil(roi_h) x ceil(roi_w) grid
inside the (continuous-coordinate) box.

torchvision's sample count is data-dependent (``sampling_ratio=-1`` =>
ceil(roi_size)), which a jit program cannot have — so we sample a static
``max_samples`` x ``max_samples`` grid and mask out samples beyond the true
per-box ceil counts. The masked mean divides by the true torch count, so the
result is bit-equivalent (up to fp summation order) for every box whose ceil
count fits in ``max_samples``.

torchvision coordinate conventions replicated here:
  * roi corners are scaled by ``spatial_scale`` then shifted by -0.5
  * roi width/height are clamped below at 0.1
  * bilinear taps outside (-1, size) contribute 0; coords clamped at 0 and
    collapsed onto the last row/col when >= size - 1
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_tap(grid: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """torchvision ``bilinear_interpolate``: grid (H, W, C), y/x (...,) -> (..., C)."""
    h, w, c = grid.shape
    out_of_range = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = jnp.maximum(y, 0.0)
    x = jnp.maximum(x, 0.0)
    y_low = jnp.floor(y).astype(jnp.int32)
    x_low = jnp.floor(x).astype(jnp.int32)
    # torch: if low >= size - 1 -> high = low = size - 1 and frac = 0
    y_edge = y_low >= h - 1
    x_edge = x_low >= w - 1
    y_low = jnp.where(y_edge, h - 1, y_low)
    x_low = jnp.where(x_edge, w - 1, x_low)
    y_high = jnp.minimum(y_low + 1, h - 1)
    x_high = jnp.minimum(x_low + 1, w - 1)
    ly = jnp.where(y_edge, 0.0, y - y_low)
    lx = jnp.where(x_edge, 0.0, x - x_low)
    hy, hx = 1.0 - ly, 1.0 - lx

    flat = grid.reshape(h * w, c)

    def take(yi, xi):
        return jnp.take(flat, yi * w + xi, axis=0)

    val = (
        take(y_low, x_low) * (hy * hx)[..., None]
        + take(y_low, x_high) * (hy * lx)[..., None]
        + take(y_high, x_low) * (ly * hx)[..., None]
        + take(y_high, x_high) * (ly * lx)[..., None]
    )
    return jnp.where(out_of_range[..., None], 0.0, val)


def ps_roi_align_1x1(
    grid: jax.Array,
    boxes: jax.Array,
    spatial_scale: float,
    max_samples: int = 40,
) -> jax.Array:
    """ps_roi_align with output_size (1, 1) over a shared grid.

    Args:
      grid: (H, W, C) feature/embedding grid.
      boxes: (P, 4) boxes in (x1, y1, x2, y2), input-space pixels.
      spatial_scale: multiplied onto box coords to reach grid space.
      max_samples: static cap on the adaptive per-dimension sample count.

    Returns: (P, C) pooled features.
    """
    p = boxes.shape[0]
    x1 = boxes[:, 0] * spatial_scale - 0.5
    y1 = boxes[:, 1] * spatial_scale - 0.5
    x2 = boxes[:, 2] * spatial_scale - 0.5
    y2 = boxes[:, 3] * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)

    # sampling_ratio=-1: ceil(roi_size / pooled_size), pooled_size == 1
    n_w = jnp.ceil(roi_w).astype(jnp.int32)
    n_h = jnp.ceil(roi_h).astype(jnp.int32)
    n_w_c = jnp.clip(n_w, 1, max_samples)
    n_h_c = jnp.clip(n_h, 1, max_samples)

    idx = jnp.arange(max_samples, dtype=jnp.float32)
    # sample centres: start + (i + 0.5) * roi / n
    ys = y1[:, None] + (idx[None, :] + 0.5) * roi_h[:, None] / n_h_c[:, None]
    xs = x1[:, None] + (idx[None, :] + 0.5) * roi_w[:, None] / n_w_c[:, None]
    ym = idx[None, :] < n_h_c[:, None]
    xm = idx[None, :] < n_w_c[:, None]

    yy = jnp.broadcast_to(ys[:, :, None], (p, max_samples, max_samples))
    xx = jnp.broadcast_to(xs[:, None, :], (p, max_samples, max_samples))
    mask = (ym[:, :, None] & xm[:, None, :]).astype(grid.dtype)

    vals = _bilinear_tap(grid, yy, xx)  # (P, S, S, C)
    total = jnp.sum(vals * mask[..., None], axis=(1, 2))
    # torch divides by the *unclamped* grid count (count = n_h * n_w)
    count = (n_h * n_w).astype(grid.dtype)
    return total / count[:, None]
