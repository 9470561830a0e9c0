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
    edges, centers = bin_edges_centers(bin_widths_normed, min_depth, max_depth)
    depth = jnp.einsum("nhwk,nk->nhw", bin_probs, centers)[..., None]
    return depth, edges


def bin_edges_centers(
    bin_widths_normed: jax.Array, min_depth: float, max_depth: float
) -> tuple[jax.Array, jax.Array]:
    n, _ = bin_widths_normed.shape
    widths = (max_depth - min_depth) * bin_widths_normed
    widths = jnp.concatenate(
        [jnp.full((n, 1), min_depth, dtype=widths.dtype), widths], axis=1
    )
    edges = jnp.cumsum(widths, axis=1)  # (N, K + 1)
    centers = 0.5 * (edges[:, :-1] + edges[:, 1:])  # (N, K)
    return edges, centers


def bins_head_depth(
    bin_widths_normed: jax.Array,
    range_maps: jax.Array,  # (B, H, W, C)
    kernel: jax.Array,  # (1, 1, C, K) conv_out kernel (checkpoint layout)
    bias: jax.Array,  # (K,)
    min_depth: float,
    max_depth: float,
    train: bool,
) -> tuple[jax.Array, jax.Array]:
    """conv_out 1x1 -> softmax over bins -> expectation, fully fused.

    Inference on TPU runs the conv INSIDE the Pallas kernel so the (B,H,W,K)
    logits never reach HBM (ops/pallas_bins.fused_conv_bins_depth). Training
    (and non-TPU backends) uses the conv + logits path, which carries the
    custom-VJP bins kernel / XLA softmax.
    """
    edges, centers = bin_edges_centers(
        bin_widths_normed.astype(jnp.float32), min_depth, max_depth
    )
    if not train and jax.default_backend() == "tpu":
        from objcavit_tpu.ops.pallas_bins import fused_conv_bins_depth

        c, k = kernel.shape[-2], kernel.shape[-1]
        depth = fused_conv_bins_depth(
            range_maps, kernel.reshape(c, k).astype(range_maps.dtype),
            bias, centers,
        )
        return depth, edges
    logits = (
        jax.lax.conv_general_dilated(
            range_maps, kernel.astype(range_maps.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + bias.astype(range_maps.dtype)
    )
    if jax.default_backend() == "tpu":
        from objcavit_tpu.ops.pallas_bins import fused_bins_depth

        depth = fused_bins_depth(logits, centers)
    else:
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        depth = jnp.einsum("nhwk,nk->nhw", probs, centers)[..., None]
    return depth, edges


def bins_logits_to_depth(
    bin_widths_normed: jax.Array,
    logits: jax.Array,
    min_depth: float,
    max_depth: float,
) -> tuple[jax.Array, jax.Array]:
    """Fused softmax-over-bins expectation directly from logits.

    On TPU this runs the single-pass Pallas kernel (ops/pallas_bins.py); on
    other backends it falls back to softmax + einsum (identical numerics).
    """
    edges, centers = bin_edges_centers(
        bin_widths_normed.astype(jnp.float32), min_depth, max_depth
    )
    if jax.default_backend() == "tpu":
        from objcavit_tpu.ops.pallas_bins import fused_bins_depth

        depth = fused_bins_depth(logits, centers)
    else:
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        depth = jnp.einsum("nhwk,nk->nhw", probs, centers)[..., None]
    return depth, edges
