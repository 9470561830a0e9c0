"""Chamfer distance between bin centres and valid GT depth values.

The reference leans on the PyTorch3D CUDA op ``chamfer_distance`` with ragged
targets (losses/BinsChamferLoss.py:27-36). Both point sets here are *scalars*
(depths in metres), which lets us replace the generic O(P*T) pairwise-distance
KNN kernel with an exact O(T log T) sorted nearest-neighbour search — far
better suited to a TPU than a pairwise matrix over T = H*W ~ 2e5 points.

Semantics replicated from pytorch3d.loss.chamfer_distance defaults
(point_reduction="mean", batch_reduction="mean", squared L2):

    cham_x[i] = mean_p  min_{t < L_i} (x[i,p] - y[i,t])^2
    cham_y[i] = mean_{t < L_i}  min_p (y[i,t] - x[i,p])^2
    loss      = mean_i cham_x[i] + mean_i cham_y[i]

Fixed shapes: ``y`` is a dense (N, T) array with a boolean validity mask
instead of pytorch3d's ragged ``y_lengths`` padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e10  # sentinel for invalid points; kept finite so (a-b)^2 stays finite


def _nn_sq_dist_sorted(queries: jax.Array, sorted_ref: jax.Array) -> jax.Array:
    """Per-query squared distance to the nearest element of sorted_ref (1-D)."""
    idx = jnp.searchsorted(sorted_ref, queries)
    right = jnp.clip(idx, 0, sorted_ref.shape[0] - 1)
    left = jnp.clip(idx - 1, 0, sorted_ref.shape[0] - 1)
    d_right = (sorted_ref[right] - queries) ** 2
    d_left = (sorted_ref[left] - queries) ** 2
    return jnp.minimum(d_left, d_right)


def masked_chamfer_1d(
    x: jax.Array, y: jax.Array, y_mask: jax.Array
) -> jax.Array:
    """Scalar chamfer loss (pytorch3d parity) for 1-D point sets.

    Args:
      x: (N, P) predicted points (bin centres). Need not be sorted.
      y: (N, T) target points (flattened GT depth).
      y_mask: (N, T) boolean; True = valid target point.

    Returns: scalar loss.
    """
    y_mask = y_mask.astype(bool)
    lengths = jnp.sum(y_mask, axis=1)

    y_valid = jnp.where(y_mask, y, _BIG)
    y_sorted = jnp.sort(y_valid, axis=1)
    x_sorted = jnp.sort(x, axis=1)

    # x -> nearest valid y
    d_x = jax.vmap(_nn_sq_dist_sorted)(x, y_sorted)  # (N, P)
    cham_x = jnp.mean(d_x, axis=1)

    # valid y -> nearest x
    d_y = jax.vmap(_nn_sq_dist_sorted)(y, x_sorted)  # (N, T)
    d_y = jnp.where(y_mask, d_y, 0.0)
    cham_y = jnp.sum(d_y, axis=1) / jnp.maximum(lengths, 1)

    return jnp.mean(cham_x) + jnp.mean(cham_y)
