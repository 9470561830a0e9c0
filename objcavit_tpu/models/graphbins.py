"""GraphBins (the full ObjCAViT depth model), reference modules/GraphBins.py.

TPU-first decomposition: the frozen detector (YOLOv7-seg) and language model
(CLIP / zeros control) run as *separate* jit programs producing a fixed-shape
padded detection structure — they are not submodules here, so "frozen params"
never enter this model's pytree and the reference's find_unused_parameters /
requires_grad_(False) machinery (GraphBins.py:85-88) disappears entirely.

forward: image -> dense features; (objects provided) -> ObjCAViT -> 1x1 conv
softmax bins -> expectation depth. Returns {depth_pred, bin_edges}.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from objcavit_tpu.models.common import ConvParams
from objcavit_tpu.models.decoder import DenseFeatureExtractor
from objcavit_tpu.models.objcavit import ObjCAViT
from objcavit_tpu.ops.bins import bins_head_depth_factored


class GraphBins(nn.Module):
    encoder_name: str = "efficientnet-b5"
    n_bins: int = 256
    min_depth: float = 0.001
    max_depth: float = 10.0
    embedding_dim: int = 128
    obj_feature_dim: int = 512
    pos_strategy: str = "learned"
    no_obj_sa: bool = False
    use_2_saca: bool = False
    do_final_upscale: bool = False
    dims_train: tuple = (416, 544)
    dims_test: tuple = (480, 640)
    drop_path_rate: float = 0.0
    dropout_rate: float = 0.1  # transformer dropout (torch default)
    fold_bn: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        image,  # (B, H, W, 3) ImageNet-normalised
        object_features,  # (B, N, obj_feature_dim)
        object_xywh,  # (B, N, 4)
        object_valid,  # (B, N) bool
        train: bool = False,
    ):
        dense = DenseFeatureExtractor(
            self.encoder_name, do_final_upscale=self.do_final_upscale,
            drop_path_rate=self.drop_path_rate, fold_bn=self.fold_bn,
            dtype=self.dtype,
            name="dense_feature_extractor",
        )(image, train)

        bin_widths_normed, feat, queries = ObjCAViT(
            im_feature_dim=128, obj_feature_dim=self.obj_feature_dim,
            n_query_channels=128, patch_size=16, dim_out=self.n_bins,
            embed_dim=self.embedding_dim, norm="linear",
            pos_strategy=self.pos_strategy, no_obj_sa=self.no_obj_sa,
            use_2_saca=self.use_2_saca, dims_train=self.dims_train,
            dims_test=self.dims_test, dropout_rate=self.dropout_rate,
            dtype=self.dtype, attn_impl=self.attn_impl, name="objcavit",
        )(dense, object_features, object_xywh, object_valid,
          deterministic=not train)

        kernel, bias = ConvParams(self.n_bins, (1, 1), name="conv_out")(
            queries.shape[1]
        )
        depth, edges = bins_head_depth_factored(
            bin_widths_normed, feat, queries, kernel, bias,
            self.min_depth, self.max_depth, train,
        )
        return {"depth_pred": depth, "bin_edges": edges}
