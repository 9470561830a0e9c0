"""Fused adaptive-bins depth reconstruction as a Pallas TPU kernel.

The bins tail (conv logits -> softmax over K=256 bins -> expectation over bin
centres, AdaBins.py:79-88) is memory-bound: at NYU eval resolution the logits
tensor is 8x240x320x256 (~150M elements), and XLA's softmax+einsum lowering
makes several full passes over it (profiled at ~10 ms/step of a 42 ms
forward). This kernel computes

    depth[s] = sum_k softmax(logits[s])_k * centers_k

in ONE read of the logits: per row, an fp32 max / exp / two reductions all in
VMEM. Backward (custom VJP) recomputes the softmax probabilities from the
saved logits — flash-style rematerialisation:

    dlogits[s,k] = p_k * (c_k - depth[s]) * g[s]
    dcenters[k]  = sum_s p_{s,k} * g[s]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(logits_ref, centers_ref, depth_ref):
    l = logits_ref[0].astype(jnp.float32)  # (T, K)
    c = centers_ref[0].astype(jnp.float32)  # (1, K)
    m = jnp.max(l, axis=-1, keepdims=True)
    e = jnp.exp(l - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    num = jnp.sum(e * c, axis=-1, keepdims=True)
    # depth block is (1, 1, T): write the (T, 1) result as a row vector
    depth_ref[0] = (num / denom).T


def _bwd_kernel(logits_ref, centers_ref, g_ref, dlogits_ref, dcenters_ref):
    l = logits_ref[0].astype(jnp.float32)  # (T, K)
    c = centers_ref[0].astype(jnp.float32)  # (1, K)
    g = g_ref[0].astype(jnp.float32)  # (1, T)
    m = jnp.max(l, axis=-1, keepdims=True)
    e = jnp.exp(l - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (T, K)
    depth = jnp.sum(p * c, axis=-1, keepdims=True)  # (T, 1)
    gt = g.T  # (T, 1)
    dlogits_ref[0] = (p * (c - depth) * gt).astype(dlogits_ref.dtype)
    dcenters_ref[0] = jnp.sum(p * gt, axis=0, keepdims=True)


@jax.custom_vjp
def _bins_expectation(logits, centers):
    return _fwd_impl(logits, centers)


def _tiles(s: int) -> int:
    for t in (512, 256, 128, 64, 32, 16, 8):
        if s % t == 0:
            return t
    return s


def _fwd_impl(logits, centers):
    b, s, k = logits.shape
    t = _tiles(s)
    nt = s // t
    grid = (b, nt)
    # outputs use a flat (b*nt, 1, t) layout so every block's trailing two
    # dims equal the array's (TPU tiling rule)
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((b * nt, 1, t), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, t), lambda i, j, nt=nt: (i * nt + j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(logits, centers[:, None, :]).reshape(b, s)


def _fwd(logits, centers):
    return _fwd_impl(logits, centers), (logits, centers)


def _bwd(res, g):
    logits, centers = res
    b, s, k = logits.shape
    t = _tiles(s)
    nt = s // t
    grid = (b, nt)
    dlogits, dcenters_part = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(logits.shape, logits.dtype),
            jax.ShapeDtypeStruct((b * nt, 1, k), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, t), lambda i, j, nt=nt: (i * nt + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, t, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, k), lambda i, j, nt=nt: (i * nt + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
    )(logits, centers[:, None, :], g.reshape(b * nt, 1, t))
    return dlogits, jnp.sum(dcenters_part.reshape(b, nt, k), axis=1)


_bins_expectation.defvjp(_fwd, _bwd)


def fused_bins_depth(
    logits: jax.Array, centers: jax.Array
) -> jax.Array:
    """(B, H, W, K) logits + (B, K) centres -> (B, H, W, 1) fp32 depth."""
    b, h, w, k = logits.shape
    depth = _bins_expectation(logits.reshape(b, h * w, k), centers)
    return depth.reshape(b, h, w, 1)


# ---------------------------------------------------------------- conv fusion
#
# Inference-only fusion one level higher: the 1x1 conv_out projection
# (AdaBins.py:51-54 / GraphBins.py:59-62) producing the K=256 logits is a
# (S, C) @ (C, K) matmul whose output is the largest tensor of the whole
# forward (8x240x320x256). Fusing it INTO the bins kernel means the logits
# never touch HBM at all: read the 128-ch range maps once, matmul in VMEM on
# the MXU, softmax + expectation in registers, write only the (S,) depth.
# Saves a ~630 MB HBM round trip per flagship batch. Forward-only by design —
# the training path keeps conv + _bins_expectation (which has a custom VJP).


def _fwd_conv_kernel(x_ref, w_ref, b_ref, centers_ref, depth_ref):
    x = x_ref[0]  # (T, C) model dtype
    w = w_ref[...]  # (C, K)
    b = b_ref[...].astype(jnp.float32)  # (1, K)
    c = centers_ref[0].astype(jnp.float32)  # (1, K)
    l = jnp.dot(x, w, preferred_element_type=jnp.float32) + b  # (T, K) fp32
    m = jnp.max(l, axis=-1, keepdims=True)
    e = jnp.exp(l - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    num = jnp.sum(e * c, axis=-1, keepdims=True)
    depth_ref[0] = (num / denom).T


def fused_conv_bins_depth(
    x: jax.Array,  # (B, H, W, C) range maps (model dtype)
    kernel: jax.Array,  # (C, K) conv_out 1x1 kernel
    bias: jax.Array,  # (K,)
    centers: jax.Array,  # (B, K) fp32 bin centres
) -> jax.Array:
    """(B, H, W, C) -> (B, H, W, 1) fp32 depth; logits stay in VMEM."""
    b, h, w_, c = x.shape
    k = kernel.shape[-1]
    s = h * w_
    t = _tiles(s)
    nt = s // t
    grid = (b, nt)
    depth = pl.pallas_call(
        _fwd_conv_kernel,
        out_shape=jax.ShapeDtypeStruct((b * nt, 1, t), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, t), lambda i, j, nt=nt: (i * nt + j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(
        x.reshape(b, s, c), kernel, bias.reshape(1, k),
        centers[:, None, :].astype(jnp.float32),
    )
    return depth.reshape(b, h, w_, 1)


def _fwd_conv_batched_kernel(x_ref, w_ref, b_ref, centers_ref, depth_ref):
    x = x_ref[0]  # (T, C) model dtype
    w = w_ref[0]  # (C, K) this image's folded kernel
    b = b_ref[...].astype(jnp.float32)  # (1, K)
    c = centers_ref[0].astype(jnp.float32)  # (1, K)
    l = jnp.dot(x, w, preferred_element_type=jnp.float32) + b  # (T, K) fp32
    m = jnp.max(l, axis=-1, keepdims=True)
    e = jnp.exp(l - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    num = jnp.sum(e * c, axis=-1, keepdims=True)
    depth_ref[0] = (num / denom).T


def fused_conv_bins_depth_batched(
    x: jax.Array,  # (B, H, W, C) features (model dtype)
    kernels: jax.Array,  # (B, C, K) per-image folded 1x1 kernels
    bias: jax.Array,  # (K,)
    centers: jax.Array,  # (B, K) fp32 bin centres
) -> jax.Array:
    """Per-image-kernel variant of ``fused_conv_bins_depth``.

    Used by the factored bins head: the ObjCAViT/miniViT range-attention
    matmul (layers.py:157, reference modules/layers.py:27-36) composed with
    the 1x1 conv_out is associatively refolded as

        logits = (feat @ Q^T) @ W = feat @ (Q^T @ W)

    so the per-image (C, K) kernel here is ``queries^T @ conv_out`` and the
    (B, H, W, n_queries) range-attention tensor never reaches HBM.
    """
    b, h, w_, c = x.shape
    k = kernels.shape[-1]
    s = h * w_
    t = _tiles(s)
    nt = s // t
    grid = (b, nt)
    depth = pl.pallas_call(
        _fwd_conv_batched_kernel,
        out_shape=jax.ShapeDtypeStruct((b * nt, 1, t), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, k), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, t), lambda i, j, nt=nt: (i * nt + j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(
        x.reshape(b, s, c), kernels, bias.reshape(1, k),
        centers[:, None, :].astype(jnp.float32),
    )
    return depth.reshape(b, h, w_, 1)
