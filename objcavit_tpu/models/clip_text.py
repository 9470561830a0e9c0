"""CLIP ViT-B/32 text encoder in flax (reference modules/CLIPWrapper.py).

The reference loads OpenAI CLIP and calls encode_text per image per step
(CLIPWrapper.py:18-24, fp16 CUDA). Here the text tower is a jit-compiled
batched program: token embedding (vocab 49408) + positional embedding
(context 77), 12 pre-LN transformer blocks (width 512, 8 heads, GELU ~
QuickGELU), final LN, then the EOT token's activation through the text
projection -> 512-d embedding.

In production the encoder runs once per distinct phrase — embeddings are
cached host-side (see language/embedding.py) because the phrase vocabulary is
finite (LVIS classes x size clauses x neighbour classes).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

CLIP_VOCAB = 49408
CLIP_CONTEXT = 77
CLIP_WIDTH = 512
CLIP_HEADS = 8
CLIP_LAYERS = 12


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        d = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(*t.shape[:-1], self.heads, d)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(d, jnp.float32))
        scores = jnp.where(causal_mask, scores, -jnp.inf)
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v)
        out = out.reshape(*out.shape[:-2], self.width)
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)


class CLIPBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        x = x + CLIPAttention(self.width, self.heads, dtype=self.dtype, name="attn")(
            h, causal_mask
        )
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    vocab_size: int = CLIP_VOCAB
    context_length: int = CLIP_CONTEXT
    width: int = CLIP_WIDTH
    heads: int = CLIP_HEADS
    layers: int = CLIP_LAYERS
    embed_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        """tokens: (B, 77) int32 (BPE ids, 0-padded after EOT).
        Returns (B, embed_dim) text features (not L2-normalised — the
        reference consumes raw encode_text outputs, CLIPWrapper.py:24)."""
        tok_emb = nn.Embed(
            self.vocab_size, self.width, dtype=self.dtype, name="token_embedding"
        )(tokens)
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok_emb + pos_emb.astype(self.dtype)[None]
        s = tokens.shape[1]
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        for i in range(self.layers):
            x = CLIPBlock(self.width, self.heads, dtype=self.dtype,
                          name=f"block{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        # take the EOT token (= highest token id per sequence, CLIP convention)
        eot = jnp.argmax(tokens, axis=-1)
        x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim),
        )
        return jnp.dot(x, proj.astype(self.dtype))
