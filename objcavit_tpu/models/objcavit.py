"""ObjCAViT: image-object self/cross-attention bin predictor.

Re-implements reference modules/ObjCAViT.py with fixed shapes: ragged
per-image detection lists become a padded (B, N_MAX) structure with a validity
mask (True = real object). Sentinel convention for images with no detections
follows the reference (:310-315): slot 0 carries xywh = (-1,-1,-1,-1) with the
language model's "<UNK>" embedding and valid = True.

Faithfully replicated reference quirks (they affect numerics, so they are
parity, not bugs to fix — each is cited):
  * SelfAttnCrossAttn pads the batch-ragged object tensor (length n_b =
    batch-max detection count) to the image sequence length at the FRONT with
    0.0001 while extending the key-padding mask at the END (:191-194), so the
    object block's position depends on n_b. Replicated exactly for ANY object
    count up to S via a data-dependent gather (see SelfAttnCrossAttn): for
    n_b <= S/2 the un-masked keys in the obj->im cross-attention are constant
    0.0001 vectors (uniform attention -> mean of the first n_valid
    image-feature values); for object-rich batches the pad/object key mix
    matches the reference too. This is what lets N_MAX honour the
    yolov7seg.max_det=1000 contract (capped at S) instead of a small
    fixed cap.
  * Invalid/padded object slots hold the constant 0.0001, not 0 (:183).
  * grid_random "img" coords: only patch 0 / patch 1 coordinates are
    normalised — and by grid height/width respectively — because the reference
    indexes [:, 0] on a (B, S, 2) tensor (:100-103); all other patches sample
    far out of range and read 0 (zero-padding grid_sample).
  * grid_random "obj" coords: x is normalised by image *height* and y by
    image *width* (:105-107).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from objcavit_tpu.models.common import PatchEmbedConv, TorchConv, TorchLinear
from objcavit_tpu.models.layers import (
    BinRegressor,
    MultiHeadAttention,
    TransformerEncoder,
)
from objcavit_tpu.ops.grid_sample import grid_sample_bilinear
from objcavit_tpu.ops.roi_align import ps_roi_align_1x1

POS_STRATEGIES = ("grid_random", "grid_random_roi_align", "learned", "learned_bbox_wh")


def _uniform01_init(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype)


class LearnedPositionalMLP(nn.Module):
    """5-layer coordinate MLP (SuperGlue-style), ObjCAViT.py:254-282."""

    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coords):
        x = coords.astype(self.dtype)
        for i, width in enumerate((32, 64, 128, 256)):
            x = TorchLinear(width, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return TorchLinear(self.embed_dim, dtype=self.dtype, name="fc4")(x)


class GridRandomPositionalEmbeddings(nn.Module):
    """Learnable per-patch embedding grid, sampled at points or over boxes.

    ``sequence_length`` is derived from the *full-resolution* train/test dims
    (ObjCAViT.py:36-46); at call time only the first ceil(fh/p)*ceil(fw/p)
    entries (half-res feature dims) are used (:79-84).
    """

    embed_dim: int
    patch_size: int
    mode: str  # "centre" | "roi_align"
    dims_train: tuple
    dims_test: tuple
    dtype: Any = jnp.float32

    def _sequence_length(self) -> int:
        p = self.patch_size
        n_train = math.ceil(self.dims_train[0] / p) * math.ceil(self.dims_train[1] / p)
        n_test = math.ceil(self.dims_test[0] / p) * math.ceil(self.dims_test[1] / p)
        return max(n_train, n_test)

    @nn.compact
    def __call__(self, coords, feat_shape, input_coord_space: str, factor: float = 2.0):
        """coords: (B, P, 2) centres or (B, P, 4) xywh (mode roi_align);
        feat_shape: (fh, fw) of the dense image features."""
        fh, fw = feat_shape
        gh = math.ceil(fh / self.patch_size)
        gw = math.ceil(fw / self.patch_size)
        table = self.param(
            "positional_encodings", _uniform01_init,
            (self._sequence_length(), self.embed_dim),
        )
        grid = table[: gh * gw].reshape(gh, gw, self.embed_dim).astype(self.dtype)
        im_h, im_w = fh * factor, fw * factor

        if self.mode == "centre":
            # at least f32 for coordinate math (f64 passes through — the
            # float64 backward oracle depends on it)
            c = coords.astype(jnp.promote_types(coords.dtype, jnp.float32))
            if input_coord_space == "img":
                # reference [:, 0] indexing quirk: only patches 0 and 1 are
                # normalised (by grid h / w respectively); see module docstring
                c = c.at[:, 0, :].set(c[:, 0, :] / gh * 2.0 - 1.0)
                if c.shape[1] > 1:
                    c = c.at[:, 1, :].set(c[:, 1, :] / gw * 2.0 - 1.0)
            else:  # "obj": x normalised by image height, y by image width
                c = jnp.stack(
                    [c[..., 0] / im_h * 2.0 - 1.0, c[..., 1] / im_w * 2.0 - 1.0],
                    axis=-1,
                )
            return jax.vmap(lambda pts: grid_sample_bilinear(grid, pts))(c)

        # roi_align: xywh -> xyxy, clamp at 0 (ObjCAViT.py:113-145)
        half_w = coords[..., 2] / 2.0
        half_h = coords[..., 3] / 2.0
        xyxy = jnp.stack(
            [
                coords[..., 0] - half_w,
                coords[..., 1] - half_h,
                coords[..., 0] + half_w,
                coords[..., 1] + half_h,
            ],
            axis=-1,
        )
        xyxy = jnp.maximum(xyxy, 0.0)
        if input_coord_space == "img":
            scale = 1.0 / self.patch_size
            max_samples = 2  # patch boxes are exactly one grid cell
        else:
            scale = 1.0 / (self.patch_size * factor)
            max_samples = 40
        return jax.vmap(
            lambda b: ps_roi_align_1x1(grid, b, scale, max_samples=max_samples)
        )(xyxy)


class SelfAttnCrossAttn(nn.Module):
    """Image SA x4 + (optional) object SA x4 + bidirectional cross-attention.

    Reference SelfAttnCrossAttn (ObjCAViT.py:150-213), including the
    front-pad/end-mask interplay documented in the module docstring.
    """

    embed_dim: int = 128
    num_heads: int = 4
    dim_feedforward: int = 1024
    no_obj_sa: bool = False
    dropout_rate: float = 0.1  # torch TransformerEncoderLayer default
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, image_emb, obj_emb, obj_pad_mask, deterministic: bool = True):
        """image_emb (B,S,E); obj_emb (B,N,E); obj_pad_mask (B,N) True=padding."""
        s = image_emb.shape[1]
        n = obj_emb.shape[1]
        assert n <= s, "object slots must not exceed the image sequence length"

        attended_image = TransformerEncoder(
            4, self.embed_dim, self.num_heads, self.dim_feedforward,
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            attn_impl=self.attn_impl, name="image_transformer",
        )(image_emb, deterministic=deterministic)

        if self.no_obj_sa:
            attended_obj = obj_emb
        else:
            attended_obj = TransformerEncoder(
                4, self.embed_dim, self.num_heads, self.dim_feedforward,
                dropout_rate=self.dropout_rate, dtype=self.dtype,
                attn_impl=self.attn_impl, name="obj_transformer",
            )(obj_emb, key_padding_mask=obj_pad_mask, deterministic=deterministic)

        amt = s - n
        b = image_emb.shape[0]
        # Reference quirk (ObjCAViT.py:191-194): the BATCH-ragged object
        # tensor — length n_b = max per-image detection count in the batch —
        # is padded to S at the FRONT with 0.0001, while the key-padding mask
        # is extended at the END with True. The object block therefore starts
        # at position S - n_b, which is data-dependent. With fixed (B, N)
        # slots we reproduce it exactly: place attended_obj[k] at position
        # S - n_b + k and fill everything before with the 0.0001 pad. Slots
        # k >= n_b (which the ragged reference never materialises) fall off
        # the end and are dropped. For the historically common regime
        # n_b <= S - n_b this reduces to "unmasked keys are constant pads";
        # for object-rich images (n_b > S/2) the mix of pad and real object
        # keys matches the reference bit-for-bit as well.
        n_b = jnp.max(jnp.sum(~obj_pad_mask, axis=1)).astype(jnp.int32)
        src = jnp.arange(s, dtype=jnp.int32)[None, :] - (s - n_b)  # (1, S)
        gathered = jnp.take_along_axis(
            attended_obj,
            jnp.broadcast_to(jnp.clip(src, 0, n - 1)[..., None], (b, s, 1)),
            axis=1,
        )
        obj_padded = jnp.where(
            ((src >= 0) & (src < n))[..., None],
            gathered,
            jnp.asarray(0.0001, dtype=attended_obj.dtype),
        )
        # mask extension: positions < n keep the per-slot mask, positions
        # >= n are True — for front-compacted validity this is j >= n_i,
        # exactly the reference's [mask(n_b), True(S - n_b)] layout
        key_padding = jnp.concatenate(
            [obj_pad_mask, jnp.ones((b, amt), dtype=bool)], axis=1
        )
        final_image = MultiHeadAttention(
            self.embed_dim, self.num_heads, dtype=self.dtype,
            attn_impl=self.attn_impl, name="cross_attn_obj_im",
        )(attended_image, obj_padded, attended_image, key_padding_mask=key_padding)
        final_obj = MultiHeadAttention(
            self.embed_dim, self.num_heads, dtype=self.dtype,
            attn_impl=self.attn_impl, name="cross_attn_im_obj",
        )(obj_padded, attended_image, obj_padded)
        return final_image, final_obj


class ObjCAViT(nn.Module):
    im_feature_dim: int = 128
    obj_feature_dim: int = 512
    n_query_channels: int = 128
    patch_size: int = 16
    dim_out: int = 256
    embed_dim: int = 128
    num_heads: int = 4
    norm: str = "linear"
    pos_strategy: str = "learned"
    no_obj_sa: bool = False
    use_2_saca: bool = False
    dims_train: tuple = (416, 544)
    dims_test: tuple = (480, 640)
    dropout_rate: float = 0.1  # torch TransformerEncoderLayer default
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        image_features,  # (B, fh, fw, C_im)
        object_features,  # (B, N, obj_feature_dim)
        object_xywh,  # (B, N, 4) full-res pixel xywh; -1 sentinel rows allowed
        object_valid,  # (B, N) bool, True = real object (incl. UNK sentinel)
        deterministic: bool = True,
    ):
        assert self.pos_strategy in POS_STRATEGIES
        b, fh, fw, _ = image_features.shape
        p = self.patch_size

        if self.pos_strategy in ("grid_random", "grid_random_roi_align"):
            pos_encoder = GridRandomPositionalEmbeddings(
                self.embed_dim, p,
                mode="centre" if self.pos_strategy == "grid_random" else "roi_align",
                dims_train=self.dims_train, dims_test=self.dims_test,
                dtype=self.dtype, name="positional_encoder",
            )
        else:
            pos_encoder = LearnedPositionalMLP(
                self.embed_dim, dtype=self.dtype, name="positional_encoder"
            )

        # --- object branch ---------------------------------------------------
        xywh = object_xywh.astype(jnp.float32)
        if self.pos_strategy == "grid_random":
            obj_pos = pos_encoder(xywh[..., 0:2], (fh, fw), "obj")
        elif self.pos_strategy == "grid_random_roi_align":
            obj_pos = pos_encoder(xywh[..., 0:4], (fh, fw), "obj")
        elif self.pos_strategy == "learned":
            obj_pos = pos_encoder(xywh[..., 0:2])
        else:  # learned_bbox_wh
            obj_pos = pos_encoder(xywh[..., 0:4])

        obj_embedding_layer = TorchLinear(
            self.embed_dim, dtype=self.dtype, name="obj_embedding_layer"
        )
        obj_emb = obj_embedding_layer(object_features.astype(self.dtype)) + obj_pos
        # padded slots hold the constant 0.0001 (reference pad value, :183)
        obj_emb = jnp.where(object_valid[..., None], obj_emb, 0.0001)
        obj_pad_mask = ~object_valid

        # --- image branch -----------------------------------------------------
        assert fh % p == 0 and fw % p == 0, "feature dims must divide patch size"
        gh, gw = fh // p, fw // p
        s = gh * gw
        img_emb = PatchEmbedConv(
            self.embed_dim, p, dtype=self.dtype, name="image_embedding_conv"
        )(image_features).reshape(b, s, self.embed_dim)

        # patch centre coords in feature-pixel space (ObjCAViT.py:335-349)
        ww = jnp.arange(gw, dtype=jnp.float32) * p + p // 2
        hh = jnp.arange(gh, dtype=jnp.float32) * p + p // 2
        coords_w = jnp.broadcast_to(ww[None, :], (gh, gw)).reshape(-1)
        coords_h = jnp.broadcast_to(hh[:, None], (gh, gw)).reshape(-1)
        patch_coords = jnp.stack(
            [coords_w, coords_h,
             jnp.full((s,), float(p)), jnp.full((s,), float(p))], axis=-1
        )
        patch_coords = jnp.broadcast_to(patch_coords[None], (b, s, 4))

        if self.pos_strategy == "grid_random":
            img_pos = pos_encoder(patch_coords[..., 0:2], (fh, fw), "img")
        elif self.pos_strategy == "grid_random_roi_align":
            img_pos = pos_encoder(patch_coords[..., 0:4], (fh, fw), "img")
        elif self.pos_strategy == "learned":
            img_pos = pos_encoder(patch_coords[..., 0:2])
        else:
            img_pos = pos_encoder(patch_coords[..., 0:4])

        img_emb = img_emb + img_pos

        # --- attention --------------------------------------------------------
        img_emb, obj_out = SelfAttnCrossAttn(
            self.embed_dim, self.num_heads, 1024, no_obj_sa=self.no_obj_sa,
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            attn_impl=self.attn_impl, name="saca_1",
        )(img_emb, obj_emb, obj_pad_mask, deterministic)
        if self.use_2_saca:
            # second SACA sees the (B, S, E) cross-attended objects with an
            # all-valid mask (reference builds fresh zero masks, :180-183)
            img_emb, obj_out = SelfAttnCrossAttn(
                self.embed_dim, self.num_heads, 1024, no_obj_sa=self.no_obj_sa,
                dropout_rate=self.dropout_rate, dtype=self.dtype,
                attn_impl=self.attn_impl, name="saca_2",
            )(img_emb, obj_out, jnp.zeros(obj_out.shape[:2], dtype=bool),
              deterministic)

        regression_head = img_emb[:, 0, :]
        queries = img_emb[:, 1 : self.n_query_channels + 1, :]
        feat = TorchConv(
            self.embed_dim, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv3x3",
        )(image_features)

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
