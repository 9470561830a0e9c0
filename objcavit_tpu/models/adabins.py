"""AdaBins depth model (reference modules/AdaBins.py).

forward: image -> DenseFeatureExtractor -> miniViT (bin widths + range maps)
-> 1x1 conv + softmax over bins -> expectation over bin centres = depth.
Returns a dict {depth_pred (B, H/2, W/2, 1), bin_edges (B, K+1)}.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from objcavit_tpu.models.common import ConvParams
from objcavit_tpu.models.decoder import DenseFeatureExtractor
from objcavit_tpu.models.minivit import MiniViT
from objcavit_tpu.ops.bins import bins_head_depth_factored


class AdaBins(nn.Module):
    encoder_name: str = "efficientnet-b5"
    n_bins: int = 256
    min_depth: float = 0.001
    max_depth: float = 10.0
    do_final_upscale: bool = False
    drop_path_rate: float = 0.0
    dropout_rate: float = 0.1  # transformer dropout (torch default)
    fold_bn: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, image, train: bool = False):
        unet_out = DenseFeatureExtractor(
            self.encoder_name, do_final_upscale=self.do_final_upscale,
            drop_path_rate=self.drop_path_rate, fold_bn=self.fold_bn,
            dtype=self.dtype,
            name="dense_feature_extractor",
        )(image, train)

        max_seq_len = 1200 if self.do_final_upscale else 500
        bin_widths_normed, feat, queries = MiniViT(
            in_channels=128, n_query_channels=128, patch_size=16,
            dim_out=self.n_bins, embed_dim=128, norm="linear",
            max_seq_len=max_seq_len, dropout_rate=self.dropout_rate,
            dtype=self.dtype, attn_impl=self.attn_impl,
            name="adaptive_bins_layer",
        )(unet_out, deterministic=not train)

        kernel, bias = ConvParams(self.n_bins, (1, 1), name="conv_out")(
            queries.shape[1]
        )
        depth, edges = bins_head_depth_factored(
            bin_widths_normed, feat, queries, kernel, bias,
            self.min_depth, self.max_depth, train,
        )
        return {"depth_pred": depth, "bin_edges": edges}
