"""SelfAttnCrossAttn numeric parity vs a torch oracle with copied weights.

The oracle reproduces the reference block's exact dataflow
(ObjCAViT.py:150-213) with stock torch modules: image SA x4, object SA x4
with key-padding masks, then bidirectional cross-attention where object
features are padded to the image sequence length at the FRONT with 0.0001
while the mask is extended at the END with True. Our fixed-shape version must
match it for ragged per-image object counts expressed as padded arrays.
"""

import pytest
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from objcavit_tpu.models.objcavit import SelfAttnCrossAttn
from tests.test_layers import _layer_params_from_torch, _mha_params_from_torch


pytestmark = pytest.mark.slow  # full-model jit compile

RNG = np.random.default_rng(23)
E = 128


class TorchSACAOracle(nn.Module):
    """Reference-dataflow oracle (built from stock torch modules)."""

    def __init__(self, no_obj_sa=False):
        super().__init__()
        layer = lambda: nn.TransformerEncoderLayer(E, 4, 1024, batch_first=True)
        self.image_encoder = nn.TransformerEncoder(
            layer(), 4, enable_nested_tensor=False
        )
        self.no_obj_sa = no_obj_sa
        if not no_obj_sa:
            self.obj_encoder = nn.TransformerEncoder(
                layer(), 4, enable_nested_tensor=False
            )
        self.cross_attn_obj_im = nn.MultiheadAttention(E, 4, batch_first=True)
        self.cross_attn_im_obj = nn.MultiheadAttention(E, 4, batch_first=True)

    def forward(self, image_emb, obj_list):
        attended_image = self.image_encoder(image_emb)
        masks = [torch.zeros(o.shape[0]).bool() for o in obj_list]
        masks = nn.utils.rnn.pad_sequence(masks, batch_first=True, padding_value=True)
        objs = nn.utils.rnn.pad_sequence(obj_list, batch_first=True,
                                         padding_value=0.0001)
        if self.no_obj_sa:
            attended_obj = objs
        else:
            attended_obj = self.obj_encoder(objs, src_key_padding_mask=masks)
        amt = attended_image.shape[1] - attended_obj.shape[1]
        key_padding = F.pad(masks, (0, amt), value=True)
        obj_padded = F.pad(attended_obj, (0, 0, amt, 0), value=0.0001)
        final_image, _ = self.cross_attn_obj_im(
            attended_image, obj_padded, attended_image,
            key_padding_mask=key_padding, need_weights=False,
        )
        final_obj, _ = self.cross_attn_im_obj(
            obj_padded, attended_image, obj_padded, need_weights=False
        )
        return final_image, final_obj


def _copy_params(oracle, no_obj_sa):
    params = {
        "image_transformer": {
            f"layer{i}": _layer_params_from_torch(oracle.image_encoder.layers[i])
            for i in range(4)
        },
        "cross_attn_obj_im": _mha_params_from_torch(oracle.cross_attn_obj_im),
        "cross_attn_im_obj": _mha_params_from_torch(oracle.cross_attn_im_obj),
    }
    if not no_obj_sa:
        params["obj_transformer"] = {
            f"layer{i}": _layer_params_from_torch(oracle.obj_encoder.layers[i])
            for i in range(4)
        }
    return params


def _run_case(no_obj_sa: bool, counts=(3, 1), s: int = 12, n_max: int = 3):
    torch.manual_seed(7)
    oracle = TorchSACAOracle(no_obj_sa).eval()

    b = len(counts)
    image_emb = RNG.standard_normal((b, s, E)).astype(np.float32)
    obj_list = [
        torch.from_numpy(RNG.standard_normal((c, E)).astype(np.float32))
        for c in counts
    ]
    with torch.no_grad():
        want_img, want_obj = oracle(torch.from_numpy(image_emb), obj_list)

    # fixed-shape inputs: pad to n_max; the module itself applies the 0.0001
    # pad value at invalid slots, so feed the raw embeddings + validity
    obj_emb = np.full((b, n_max, E), 0.0001, np.float32)
    valid = np.zeros((b, n_max), bool)
    for i, o in enumerate(obj_list):
        obj_emb[i, : counts[i]] = o.numpy()
        valid[i, : counts[i]] = True

    saca = SelfAttnCrossAttn(E, 4, 1024, no_obj_sa=no_obj_sa)
    got_img, got_obj = saca.apply(
        {"params": _copy_params(oracle, no_obj_sa)},
        jnp.asarray(image_emb), jnp.asarray(obj_emb),
        jnp.asarray(~valid),
    )
    np.testing.assert_allclose(
        np.asarray(got_img), want_img.numpy(), rtol=1e-4, atol=1e-5
    )
    # final_object_features: the data-dependent front-pad construction places
    # our N fixed slots at the torch ragged layout's positions (object block
    # starts at S - n_b where n_b = batch-max count), so ALL S positions
    # align exactly here.
    np.testing.assert_allclose(
        np.asarray(got_obj), want_obj.numpy(), rtol=1e-4, atol=1e-5
    )


def test_saca_matches_reference_dataflow():
    _run_case(no_obj_sa=False)


def test_saca_no_obj_sa_matches_reference_dataflow():
    _run_case(no_obj_sa=True)


def test_saca_fixed_slots_wider_than_batch_max():
    """N fixed slots > n_b (batch-max ragged width): the detection-capacity
    regime where slot arrays are sized for max_det but the batch carries few
    objects. The torch oracle pads only to n_b=3; our N=8 slots must still
    land on the reference layout (VERDICT r3 weak #1)."""
    _run_case(no_obj_sa=False, counts=(3, 1), s=12, n_max=8)


def test_saca_object_rich_beyond_half_seq():
    """n_b > S/2: unmasked cross-attention keys are a MIX of 0.0001 pads and
    real object embeddings (the reference's data-dependent quirk regime that
    a static front-pad cannot reproduce). 9 objects vs S=12."""
    _run_case(no_obj_sa=False, counts=(9, 4), s=12, n_max=9)


def test_saca_full_capacity_n_equals_s():
    """n_b == N == S: object slots fill the whole image sequence length (the
    max_det >= S ceiling: N_max = min(max_det, S))."""
    _run_case(no_obj_sa=False, counts=(12, 5), s=12, n_max=12)
