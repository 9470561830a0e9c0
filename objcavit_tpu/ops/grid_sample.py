"""Bilinear point sampling with exact ``torch.nn.functional.grid_sample`` semantics.

The reference's ``grid_random`` positional-embedding strategy samples a learned
embedding grid at object-centre coordinates via ``F.grid_sample`` with default
arguments, i.e. bilinear, ``padding_mode='zeros'``, ``align_corners=False``
(modules/ObjCAViT.py:99,109). Out-of-range coordinates therefore fade to zero —
behaviour we must keep (the reference relies on it; see the "img" branch whose
normalisation sends most coordinates far out of range).

TPU-first shape: instead of torch's (N, H_out, W_out, 2) grid we take a flat
(..., 2) list of points in normalised (x, y) in [-1, 1] and gather with
``jnp.take`` along flattened spatial indices — XLA lowers this to a dynamic
gather that vectorises fine for the few hundred points per image we need.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_bilinear(grid: jax.Array, points: jax.Array) -> jax.Array:
    """Sample ``grid`` (H, W, C) at ``points`` (P, 2) of normalised (x, y).

    Matches torch ``grid_sample(bilinear, zeros, align_corners=False)``:
    unnormalised coord = ((v + 1) * size - 1) / 2; out-of-bounds taps read 0.

    Returns (P, C).
    """
    h, w, c = grid.shape
    x = (points[:, 0] + 1.0) * w / 2.0 - 0.5
    y = (points[:, 1] + 1.0) * h / 2.0 - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def tap(yi, xi, weight):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = jnp.take(grid.reshape(h * w, c), yc * w + xc, axis=0)
        return vals * (weight * inb.astype(grid.dtype))[:, None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    out = (
        tap(y0i, x0i, (1 - fx) * (1 - fy))
        + tap(y0i, x0i + 1, fx * (1 - fy))
        + tap(y0i + 1, x0i, (1 - fx) * fy)
        + tap(y0i + 1, x0i + 1, fx * fy)
    )
    return out
