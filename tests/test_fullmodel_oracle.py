"""Full-model converted-weights forward oracle: encoder -> decoder -> ObjCAViT
-> conv_out -> bins -> depth, through ``convert_state_dict`` against a
one-piece torch oracle (VERDICT r2, missing #2 — block parity does not compose
for free across layout/padding boundaries).

The torch oracle assembles the reference dataflow (GraphBins.py:81-119) from
stock torch modules, with the exact module names the converter consumes
(dense_feature_extractor.encoder.original_model.*, .decoder.*, objcavit.*,
conv_out.0). Objects are ragged per-image lists in torch (the reference
contract) vs our padded fixed-shape structure.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from objcavit_tpu.models import GraphBins
from objcavit_tpu.utils.torch_import import convert_state_dict

from tests.test_dfe_oracle import TorchDecoder, TorchEncoder, _randomize
from tests.test_dfe_oracle_v2 import TorchV2Encoder, _randomize_v2
from objcavit_tpu.models.efficientnet import ENCODER_SPECS

pytestmark = pytest.mark.slow  # full-model jit compile + big torch forward

E = 128


class _TorchEncoderWrap(tnn.Module):
    def __init__(self, spec, enc_cls):
        super().__init__()
        self.original_model = enc_cls(spec)

    def forward(self, x):
        return self.original_model(x)


class _TorchDFE(tnn.Module):
    def __init__(self, spec, enc_cls):
        super().__init__()
        self.encoder = _TorchEncoderWrap(spec, enc_cls)
        self.decoder = TorchDecoder(spec)

    def forward(self, x):
        return self.decoder(self.encoder(x))


class _TorchSACA(tnn.Module):
    """Reference SelfAttnCrossAttn with the reference's module names
    (ObjCAViT.py:150-213)."""

    def __init__(self):
        super().__init__()
        layer = lambda: tnn.TransformerEncoderLayer(E, 4, 1024, batch_first=True)
        self.image_transformer_encoder = tnn.TransformerEncoder(
            layer(), 4, enable_nested_tensor=False
        )
        self.obj_transformer_encoder = tnn.TransformerEncoder(
            layer(), 4, enable_nested_tensor=False
        )
        self.cross_attn_obj_im = tnn.MultiheadAttention(E, 4, batch_first=True)
        self.cross_attn_im_obj = tnn.MultiheadAttention(E, 4, batch_first=True)

    def forward(self, image_emb, obj_list):
        attended_image = self.image_transformer_encoder(image_emb)
        masks = [torch.zeros(o.shape[0]).bool() for o in obj_list]
        masks = tnn.utils.rnn.pad_sequence(masks, batch_first=True,
                                           padding_value=True)
        objs = tnn.utils.rnn.pad_sequence(obj_list, batch_first=True,
                                          padding_value=0.0001)
        attended_obj = self.obj_transformer_encoder(objs, src_key_padding_mask=masks)
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


class _TorchObjCAViT(tnn.Module):
    """Reference ObjCAViT, learned_bbox_wh strategy (ObjCAViT.py:216-391)."""

    def __init__(self, n_bins=256, patch=16):
        super().__init__()
        self.patch = patch
        self.positional_encoder = tnn.Sequential(
            tnn.Linear(4, 32), tnn.LeakyReLU(),
            tnn.Linear(32, 64), tnn.LeakyReLU(),
            tnn.Linear(64, 128), tnn.LeakyReLU(),
            tnn.Linear(128, 256), tnn.LeakyReLU(),
            tnn.Linear(256, E),
        )
        self.image_embedding_convPxP = tnn.Conv2d(E, E, patch, patch, 0)
        self.obj_embedding_layer = tnn.Linear(512, E)
        self.saca_1 = _TorchSACA()
        self.conv3x3 = tnn.Conv2d(E, E, 3, 1, 1)
        self.regressor = tnn.Sequential(
            tnn.Linear(E, 256), tnn.LeakyReLU(),
            tnn.Linear(256, 256), tnn.LeakyReLU(),
            tnn.Linear(256, n_bins),
        )

    def forward(self, image_features, object_features, object_xywh_list):
        p = self.patch
        obj_feats = []
        for i, xywhs in enumerate(object_xywh_list):
            pos = self.positional_encoder(xywhs[:, 0:4])
            obj_feats.append(self.obj_embedding_layer(object_features[i]) + pos)

        image_patch_embeddings = self.image_embedding_convPxP(image_features)
        gh, gw = image_patch_embeddings.shape[2:]
        cw = torch.arange(gw).view(1, -1).expand(gh, -1)
        ch = torch.arange(gh).view(-1, 1).expand(-1, gw)
        pc = torch.stack([cw, ch], 0) * p + p // 2
        pc = pc.flatten(1).expand(image_features.shape[0], -1, -1)
        pc = pc.permute(0, 2, 1).to(image_features.dtype)
        sizes = torch.ones_like(pc) * p
        pc = torch.cat([pc, sizes], dim=2)
        img_pos = self.positional_encoder(pc[..., 0:4]).permute(0, 2, 1)
        x = image_patch_embeddings.flatten(2) + img_pos
        x = x.permute(0, 2, 1)

        x, _objs = self.saca_1(x, obj_feats)
        head, queries = x[:, 0, :], x[:, 1 : E + 1, :]
        feat = self.conv3x3(image_features)
        n, c, h, w = feat.size()
        y = torch.matmul(
            feat.view(n, c, h * w).permute(0, 2, 1), queries.permute(0, 2, 1)
        )
        range_maps = y.permute(0, 2, 1).view(n, E, h, w).contiguous()
        b = self.regressor(head)
        b = torch.relu(b) + 0.1
        b = b / b.sum(dim=1, keepdim=True)
        return b, range_maps


class TorchGraphBins(tnn.Module):
    def __init__(self, spec, n_bins=256, min_depth=0.001, max_depth=10.0,
                 enc_cls=TorchEncoder):
        super().__init__()
        self.min_depth, self.max_depth = min_depth, max_depth
        self.dense_feature_extractor = _TorchDFE(spec, enc_cls)
        self.objcavit = _TorchObjCAViT(n_bins)
        self.conv_out = tnn.Sequential(
            tnn.Conv2d(E, n_bins, 1, 1, 0), tnn.Softmax(dim=1)
        )

    def forward(self, image, object_features, object_xywh_list):
        dense = self.dense_feature_extractor(image)
        widths_normed, range_maps = self.objcavit(
            dense, object_features, object_xywh_list
        )
        out = self.conv_out(range_maps)
        widths = (self.max_depth - self.min_depth) * widths_normed
        widths = F.pad(widths, (1, 0), value=self.min_depth)
        edges = torch.cumsum(widths, dim=1)
        centers = 0.5 * (edges[:, :-1] + edges[:, 1:])
        centers = centers.view(*centers.shape, 1, 1)
        depth = torch.sum(out * centers, dim=1, keepdim=True)
        return depth, edges


@pytest.mark.parametrize(
    "name,enc_cls,randomize",
    [
        ("efficientnet-tiny", TorchEncoder, _randomize),
        # v2: torchvision naming + head BN+SiLU, through the same
        # convert_state_dict dispatch a real v2 Lightning ckpt would take
        ("efficientnet-v2-tiny", TorchV2Encoder, _randomize_v2),
    ],
    ids=["b-series", "v2"],
)
def test_graphbins_converted_weights_full_forward_parity(
    name, enc_cls, randomize
):
    torch.manual_seed(11)
    rng = np.random.default_rng(17)
    oracle = TorchGraphBins(ENCODER_SPECS[name], enc_cls=enc_cls)
    randomize(oracle, rng)
    # _randomize rescales every >=2D weight; redo sane transformer init so
    # attention logits stay in a realistic range
    with torch.no_grad():
        for mod in oracle.objcavit.modules():
            if isinstance(mod, (tnn.Linear, tnn.MultiheadAttention)):
                for prm in mod.parameters():
                    if prm.ndim >= 2:
                        tnn.init.xavier_uniform_(prm)
    oracle.eval()

    # 384x384 -> dense 192x192 -> 12x12=144 patches (>= 129 queries + head)
    b, h, w = 2, 384, 384
    img = rng.standard_normal((b, 3, h, w)).astype(np.float32) * 0.5
    counts = [3, 1]  # ragged object lists
    feats = [rng.standard_normal((c, 512)).astype(np.float32) for c in counts]
    xywhs = [
        np.stack([rng.uniform(0, w, c), rng.uniform(0, h, c),
                  rng.uniform(10, 120, c), rng.uniform(10, 120, c)],
                 -1).astype(np.float32)
        for c in counts
    ]
    with torch.no_grad():
        want_depth, want_edges = oracle(
            torch.from_numpy(img),
            [torch.from_numpy(f) for f in feats],
            [torch.from_numpy(x) for x in xywhs],
        )

    sd = {f"model.{k}": v.numpy() for k, v in oracle.state_dict().items()}
    variables = convert_state_dict(
        sd, "graphbins", name, pos_strategy="learned_bbox_wh"
    )
    variables = jax.tree.map(jnp.asarray, variables)

    n_max = max(counts)
    pf = np.zeros((b, n_max, 512), np.float32)
    px = np.full((b, n_max, 4), -1.0, np.float32)
    pv = np.zeros((b, n_max), bool)
    for i, c in enumerate(counts):
        pf[i, :c] = feats[i]
        px[i, :c] = xywhs[i]
        pv[i, :c] = True

    model = GraphBins(
        encoder_name=name, n_bins=256, min_depth=0.001, max_depth=10.0,
        pos_strategy="learned_bbox_wh", dims_train=(h, w), dims_test=(h, w),
    )
    out = model.apply(
        variables, jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(pf),
        jnp.asarray(px), jnp.asarray(pv), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["bin_edges"]), want_edges.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["depth_pred"])[..., 0],
        want_depth.numpy()[:, 0], rtol=1e-3, atol=1e-3,
    )
