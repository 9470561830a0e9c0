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


def bins_head_depth_factored(
    bin_widths_normed: jax.Array,
    feat: jax.Array,  # (B, H, W, C) conv3x3 output (model dtype)
    queries: jax.Array,  # (B, K_q, C) transformer query tokens
    kernel: jax.Array,  # (1, 1, K_q, K) conv_out kernel (checkpoint layout)
    bias: jax.Array,  # (K,)
    min_depth: float,
    max_depth: float,
    train: bool,
) -> tuple[jax.Array, jax.Array]:
    """Bins head on the FACTORED range-attention maps.

    The reference computes range maps with a pixel-wise dot product
    (modules/layers.py:27-36) and then a 1x1 conv over them
    (AdaBins.py:51-54 / GraphBins.py:59-62):

        logits = (feat @ queries^T) @ W + b

    The (B, H, W, K_q) intermediate is the second-largest tensor of the
    forward. On TPU inference we refold associatively — per image,
    ``M_b = queries_b^T @ W`` (a (C, K) matmul of negligible cost) — so the
    range maps never exist in HBM and the Pallas bins kernel contracts the
    decoder features directly. Training (and non-TPU backends) keeps the
    reference op order, which the bins custom-VJP path differentiates.
    """
    if not train and jax.default_backend() == "tpu":
        from objcavit_tpu.ops.pallas_bins import fused_conv_bins_depth_batched

        edges, centers = bin_edges_centers(
            bin_widths_normed.astype(jnp.float32), min_depth, max_depth
        )
        kq, k = kernel.shape[-2], kernel.shape[-1]
        m = jnp.einsum(
            "bqc,qk->bck", queries.astype(jnp.float32),
            kernel.reshape(kq, k).astype(jnp.float32),
        ).astype(feat.dtype)
        depth = fused_conv_bins_depth_batched(feat, m, bias, centers)
        return depth, edges
    from objcavit_tpu.models.layers import pixelwise_dot_product

    range_maps = pixelwise_dot_product(feat, queries)
    return bins_head_depth(
        bin_widths_normed, range_maps, kernel, bias, min_depth, max_depth,
        train,
    )
