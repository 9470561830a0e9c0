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


def _run_case(no_obj_sa: bool):
    torch.manual_seed(7)
    oracle = TorchSACAOracle(no_obj_sa).eval()

    b, s, n_max = 2, 12, 3
    image_emb = RNG.standard_normal((b, s, E)).astype(np.float32)
    # ragged: image 0 has 3 objects, image 1 has 1
    counts = [3, 1]
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
    # final_object_features: only positions corresponding to the torch padded
    # layout are comparable. torch pads objs to max count (3) then
    # front-pads to S; our N dim is n_max=3 == torch max count, so layouts
    # align exactly here.
    np.testing.assert_allclose(
        np.asarray(got_obj), want_obj.numpy(), rtol=1e-4, atol=1e-5
    )


def test_saca_matches_reference_dataflow():
    _run_case(no_obj_sa=False)


def test_saca_no_obj_sa_matches_reference_dataflow():
    _run_case(no_obj_sa=True)
