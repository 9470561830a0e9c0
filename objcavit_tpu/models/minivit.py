"""miniViT adaptive-bins head (reference modules/miniViT.py).

Token 0 of the patch transformer regresses normalised bin widths
(relu + 0.1 eps, normalised to sum 1 — 'linear' norm); tokens 1..K are the
query vectors for the pixel-wise dot product against a 3x3-conv'd copy of the
input feature map, yielding K "range attention maps".
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from objcavit_tpu.models.common import TorchConv
from objcavit_tpu.models.layers import (
    BinRegressor,
    PatchTransformerEncoder,
)


class MiniViT(nn.Module):
    in_channels: int = 128
    n_query_channels: int = 128
    patch_size: int = 16
    dim_out: int = 256
    embed_dim: int = 128
    num_heads: int = 4
    norm: str = "linear"
    max_seq_len: int = 500
    dropout_rate: float = 0.1  # torch TransformerEncoderLayer default
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        tgt = PatchTransformerEncoder(
            self.in_channels, self.patch_size, self.embed_dim, self.num_heads,
            self.max_seq_len, dropout_rate=self.dropout_rate,
            dtype=self.dtype, attn_impl=self.attn_impl,
            name="patch_transformer",
        )(x, deterministic)  # (B, S, E)
        feat = TorchConv(
            self.embed_dim, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv3x3",
        )(x)

        regression_head = tgt[:, 0, :]
        queries = tgt[:, 1 : self.n_query_channels + 1, :]

        y = BinRegressor(self.dim_out, dtype=self.dtype, name="regressor")(
            regression_head
        )
        if self.norm == "linear":
            y = nn.relu(y) + 0.1
            y = y / jnp.sum(y, axis=1, keepdims=True)
        elif self.norm == "softmax":
            y = nn.softmax(y, axis=1)
        else:
            y = nn.sigmoid(y)
            y = y / jnp.sum(y, axis=1, keepdims=True)
        # range-attention maps stay FACTORED as (feat, queries); the bins
        # head contracts them (ops/bins.bins_head_depth_factored) so the
        # (B, H, W, K_q) tensor (reference modules/layers.py:27-36) is never
        # materialised on the TPU inference path.
        return y, feat, queries
