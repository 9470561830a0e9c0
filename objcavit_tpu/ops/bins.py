"""Adaptive-bins depth reconstruction (AdaBins tail), NHWC.

Replicates the bins -> edges -> centres -> expectation tail shared by both
models in the reference (modules/AdaBins.py:79-88, modules/GraphBins.py:109-119):

    bin_widths = (max_depth - min_depth) * bin_widths_normed
    bin_widths = pad_left(bin_widths, min_depth)
    bin_edges  = cumsum(bin_widths)
    centers    = 0.5 * (edges[:-1] + edges[1:])
    depth      = sum_k probs_k * centers_k
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bins_to_depth(
    bin_widths_normed: jax.Array,
    bin_probs: jax.Array,
    min_depth: float,
    max_depth: float,
) -> tuple[jax.Array, jax.Array]:
    """Args:
      bin_widths_normed: (N, K) normalised bin widths (sum to 1 per row).
      bin_probs: (N, H, W, K) per-pixel softmax over bins.
      min_depth / max_depth: dataset depth range in metres.

    Returns: (depth (N, H, W, 1), bin_edges (N, K + 1)).
    """
    n, k = bin_widths_normed.shape
    widths = (max_depth - min_depth) * bin_widths_normed
    widths = jnp.concatenate(
        [jnp.full((n, 1), min_depth, dtype=widths.dtype), widths], axis=1
    )
    edges = jnp.cumsum(widths, axis=1)  # (N, K + 1)
    centers = 0.5 * (edges[:, :-1] + edges[:, 1:])  # (N, K)
    depth = jnp.einsum("nhwk,nk->nhw", bin_probs, centers)[..., None]
    return depth, edges
