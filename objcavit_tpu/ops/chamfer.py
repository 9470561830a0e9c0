"""Chamfer distance between bin centres and valid GT depth values.

The reference leans on the PyTorch3D CUDA op ``chamfer_distance`` with ragged
targets (losses/BinsChamferLoss.py:27-36). Semantics replicated from
pytorch3d defaults (point_reduction="mean", batch_reduction="mean", squared
L2):

    cham_x[i] = mean_p  min_{t < L_i} (x[i,p] - y[i,t])^2
    cham_y[i] = mean_{t < L_i}  min_p (y[i,t] - x[i,p])^2
    loss      = mean_i cham_x[i] + mean_i cham_y[i]

TPU-first formulation: both directions are broadcast-subtract-square-min
reductions over the implicit (B, P, T) distance tensor. XLA fuses the
elementwise math into the min-reductions, so the tensor is never
materialised — and the VJP (argmin select) fuses the same way. This replaced
an earlier sort+searchsorted design: TPU lowers searchsorted to while loops
and sort to many bitonic passes, which profiled at ~400 ms inside the train
step vs ~5 ms for the fused reductions (T = H*W ~ 2e5 points).

Fixed shapes: ``y`` is a dense (N, T) array with a boolean validity mask
instead of pytorch3d's ragged ``y_lengths`` padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e10  # sentinel for invalid points; kept finite so (a-b)^2 stays finite


def masked_chamfer_1d(
    x: jax.Array, y: jax.Array, y_mask: jax.Array
) -> jax.Array:
    """Scalar chamfer loss (pytorch3d parity) for 1-D point sets.

    Args:
      x: (N, P) predicted points (bin centres).
      y: (N, T) target points (flattened GT depth).
      y_mask: (N, T) boolean; True = valid target point.

    Returns: scalar loss.
    """
    y_mask = y_mask.astype(bool)
    lengths = jnp.sum(y_mask, axis=1)
    # rows with zero valid targets (padded eval samples) contribute nothing;
    # without this guard cham_x for such a row is ~_BIG^2
    row_valid = lengths > 0
    n_rows = jnp.maximum(jnp.sum(row_valid), 1)

    y_for_x = jnp.where(y_mask, y, _BIG)  # invalid targets can never be nearest
    # (B, P, T) implicit distance tensor; both reductions fuse in XLA
    d_x = jnp.min(
        jnp.square(x[:, :, None] - y_for_x[:, None, :]), axis=2
    )  # (N, P)
    cham_x = jnp.where(row_valid, jnp.mean(d_x, axis=1), 0.0)

    d_y = jnp.min(jnp.square(y[:, :, None] - x[:, None, :]), axis=2)  # (N, T)
    d_y = jnp.where(y_mask, d_y, 0.0)
    cham_y = jnp.sum(d_y, axis=1) / jnp.maximum(lengths, 1)

    return jnp.sum(cham_x) / n_rows + jnp.sum(cham_y) / n_rows
