"""Transformer building blocks with torch-module parity (reference layers.py).

Replicates (numerics and init distributions) the torch modules the reference
builds its attention stacks from:
  * nn.MultiheadAttention: packed xavier-uniform in_proj, zero in_proj bias,
    default-Linear out_proj with zero bias
  * nn.TransformerEncoderLayer: post-LN, ReLU FFN (dim 1024), dropout 0.1
  * nn.TransformerEncoder: N independent layers
  * PatchTransformerEncoder (layers.py:5-24): conv patch embed (k=s=16),
    learnable uniform[0,1) positional table sliced to seq len, 4-layer encoder
  * PixelWiseDotProduct (layers.py:27-36): batched matmul between a feature
    map and query vectors -> "range attention maps"

Layout: sequences are (B, S, E); feature maps NHWC.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from objcavit_tpu.models.common import PatchEmbedConv, TorchConv, TorchLinear, torch_kernel_init
from objcavit_tpu.ops.attention import mha_core


def _xavier_packed_init(key, shape, dtype=jnp.float32):
    """xavier_uniform over torch's packed (3E, E) in_proj; shape here (E, 3E)."""
    e = shape[0]
    bound = math.sqrt(6.0 / (e + 3 * e))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class MultiHeadAttention(nn.Module):
    """torch nn.MultiheadAttention parity (batch_first semantics)."""

    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None):
        e = self.embed_dim
        h = self.num_heads
        d = e // h
        in_kernel = self.param("in_proj_kernel", _xavier_packed_init, (e, 3 * e))
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        wq, wk, wv = jnp.split(in_kernel.astype(self.dtype), 3, axis=1)
        bq, bk, bv = jnp.split(in_bias.astype(self.dtype), 3)

        def heads(x, w, b):
            y = jnp.dot(x.astype(self.dtype), w) + b
            return y.reshape(*y.shape[:-1], h, d)

        q = heads(query, wq, bq)
        k = heads(key, wk, bk)
        v = heads(value, wv, bv)
        out = mha_core(q, k, v, key_padding_mask, impl=self.attn_impl)
        out = out.reshape(*out.shape[:-2], e)
        out_kernel = self.param("out_kernel", torch_kernel_init, (e, e))
        out_bias = self.param("out_bias", nn.initializers.zeros, (e,))
        return jnp.dot(out, out_kernel.astype(self.dtype)) + out_bias.astype(self.dtype)


class TransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer parity (post-LN, ReLU)."""

    embed_dim: int
    num_heads: int
    dim_feedforward: int = 1024
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic: bool = True):
        attn = MultiHeadAttention(
            self.embed_dim, self.num_heads, dtype=self.dtype,
            attn_impl=self.attn_impl, name="self_attn",
        )(x, x, x, key_padding_mask)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + attn)

        h = TorchLinear(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = TorchLinear(self.embed_dim, dtype=self.dtype, name="linear2")(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + h)
        return x


class TransformerEncoder(nn.Module):
    """Stack of independent TransformerEncoderLayers."""

    num_layers: int
    embed_dim: int
    num_heads: int
    dim_feedforward: int = 1024
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic: bool = True):
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.embed_dim, self.num_heads, self.dim_feedforward,
                self.dropout_rate, dtype=self.dtype, attn_impl=self.attn_impl,
                name=f"layer{i}",
            )(x, key_padding_mask, deterministic)
        return x


def _uniform01_init(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype)  # torch.rand parity


class PatchTransformerEncoder(nn.Module):
    """Conv patch embed + learnable positional table + 4-layer encoder.

    Returns (B, S, E) — the reference's S,N,E layout is purely an artifact of
    torch's non-batch-first transformer.
    """

    in_channels: int
    patch_size: int = 10
    embed_dim: int = 128
    num_heads: int = 4
    max_seq_len: int = 500
    dropout_rate: float = 0.1  # torch TransformerEncoderLayer default
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = self.patch_size
        emb = PatchEmbedConv(
            self.embed_dim, p, dtype=self.dtype, name="embedding_conv"
        )(x)  # (B, H/p, W/p, E)
        b, gh, gw, e = emb.shape
        s = gh * gw
        emb = emb.reshape(b, s, e)
        pos = self.param(
            "positional_encodings", _uniform01_init, (self.max_seq_len, self.embed_dim)
        )
        emb = emb + pos[:s].astype(self.dtype)[None]
        return TransformerEncoder(
            4, self.embed_dim, self.num_heads, 1024,
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            attn_impl=self.attn_impl, name="transformer",
        )(emb, deterministic=deterministic)


def pixelwise_dot_product(x: jax.Array, queries: jax.Array) -> jax.Array:
    """(B, H, W, C) x (B, K, C) -> (B, H, W, K) range-attention maps."""
    return jnp.einsum("bhwc,bkc->bhwk", x, queries)


class BinRegressor(nn.Module):
    """MLP head: E -> 256 -> 256 -> dim_out with LeakyReLU (miniViT.py:16-20)."""

    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(256, dtype=self.dtype, name="fc0")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = TorchLinear(256, dtype=self.dtype, name="fc1")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        return TorchLinear(self.dim_out, dtype=self.dtype, name="fc2")(x)
