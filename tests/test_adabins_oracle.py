"""AdaBins END-TO-END converted-weights oracle (VERDICT r4 next-round #7).

GraphBins has a one-piece forward+backward oracle
(test_fullmodel_oracle.py / test_backward_oracle.py); the baseline AdaBins
family was covered only piecewise (test_dfe_oracle.py, test_layers.py).
This pins the full converted path encoder -> decoder -> miniViT -> bins ->
depth (reference modules/AdaBins.py:33-89 + modules/miniViT.py:6-44) in one
composition, forward AND backward, through the exact convert_state_dict
dispatch a real `adabins` Lightning checkpoint takes.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from objcavit_tpu.losses import LossWrapper
from objcavit_tpu.models import AdaBins
from objcavit_tpu.models.efficientnet import ENCODER_SPECS
from objcavit_tpu.utils.torch_import import convert_state_dict

from tests.test_backward_oracle import _torch_bins_chamfer, _torch_silog
from tests.test_dfe_oracle import TorchEncoder, _randomize
from tests.test_dfe_oracle_v2 import TorchV2Encoder, _randomize_v2
from tests.test_fullmodel_oracle import _TorchDFE

pytestmark = pytest.mark.slow  # full-model jit compile + torch forward

E = 128
MIN_DEPTH, MAX_DEPTH = 0.001, 10.0


class _TorchPatchTransformer(tnn.Module):
    """Reference PatchTransformerEncoder (modules/layers.py:5-24) with the
    converter's expected module names; batch_first layout (equivalent)."""

    def __init__(self, in_ch, patch=16, max_seq_len=500):
        super().__init__()
        self.embedding_convPxP = tnn.Conv2d(in_ch, E, patch, patch, 0)
        self.positional_encodings = tnn.Parameter(torch.rand(max_seq_len, E))
        layer = tnn.TransformerEncoderLayer(E, 4, 1024, batch_first=True)
        self.transformer_encoder = tnn.TransformerEncoder(
            layer, 4, enable_nested_tensor=False
        )

    def forward(self, x):
        emb = self.embedding_convPxP(x).flatten(2)  # (B, E, S)
        emb = emb + self.positional_encodings[: emb.shape[2], :].T.unsqueeze(0)
        return self.transformer_encoder(emb.permute(0, 2, 1))  # (B, S, E)


class TorchMiniViT(tnn.Module):
    """Reference mViT (modules/miniViT.py:6-44), 'linear' norm."""

    def __init__(self, in_ch=E, n_bins=256, n_query=E):
        super().__init__()
        self.n_query = n_query
        self.patch_transformer = _TorchPatchTransformer(in_ch)
        self.conv3x3 = tnn.Conv2d(in_ch, E, 3, 1, 1)
        self.regressor = tnn.Sequential(
            tnn.Linear(E, 256), tnn.LeakyReLU(),
            tnn.Linear(256, 256), tnn.LeakyReLU(),
            tnn.Linear(256, n_bins),
        )

    def forward(self, x):
        tgt = self.patch_transformer(x)
        head = tgt[:, 0, :]
        queries = tgt[:, 1 : self.n_query + 1, :]
        feat = self.conv3x3(x)
        n, c, h, w = feat.size()
        y = torch.matmul(
            feat.view(n, c, h * w).permute(0, 2, 1), queries.permute(0, 2, 1)
        )
        range_maps = y.permute(0, 2, 1).view(n, self.n_query, h, w).contiguous()
        b = self.regressor(head)
        b = torch.relu(b) + 0.1
        b = b / b.sum(dim=1, keepdim=True)
        return b, range_maps


class TorchAdaBins(tnn.Module):
    """Reference AdaBins dataflow (modules/AdaBins.py:33-89), with the
    module names convert_state_dict's 'adabins' branch consumes."""

    def __init__(self, spec, n_bins=256, enc_cls=TorchEncoder):
        super().__init__()
        self.dense_feature_extractor = _TorchDFE(spec, enc_cls)
        self.adaptive_bins_layer = TorchMiniViT(n_bins=n_bins)
        self.conv_out = tnn.Sequential(
            tnn.Conv2d(E, n_bins, 1, 1, 0), tnn.Softmax(dim=1)
        )

    def forward(self, image):
        unet_out = self.dense_feature_extractor(image)
        widths_normed, range_maps = self.adaptive_bins_layer(unet_out)
        out = self.conv_out(range_maps)
        widths = (MAX_DEPTH - MIN_DEPTH) * widths_normed
        widths = F.pad(widths, (1, 0), value=MIN_DEPTH)
        edges = torch.cumsum(widths, dim=1)
        centers = 0.5 * (edges[:, :-1] + edges[:, 1:])
        centers = centers.view(*centers.shape, 1, 1)
        depth = torch.sum(out * centers, dim=1, keepdim=True)
        return depth, edges


ENCODERS = {
    # b-series (gen-efficientnet naming/TF-SAME) and v2 (torchvision
    # naming + head BN+SiLU): both converter dispatch paths, so the v2
    # family's BACKWARD parity is pinned too (previously forward-only,
    # tests/test_dfe_oracle_v2.py)
    "efficientnet-tiny": (TorchEncoder, _randomize),
    "efficientnet-v2-tiny": (TorchV2Encoder, _randomize_v2),
}


def _build_pair(name="efficientnet-tiny"):
    torch.manual_seed(23)
    rng = np.random.default_rng(31)
    enc_cls, randomize = ENCODERS[name]
    oracle = TorchAdaBins(ENCODER_SPECS[name], enc_cls=enc_cls)
    randomize(oracle, rng)
    with torch.no_grad():
        for mod in oracle.adaptive_bins_layer.modules():
            if isinstance(mod, (tnn.Linear, tnn.MultiheadAttention)):
                for prm in mod.parameters():
                    if prm.ndim >= 2:
                        tnn.init.xavier_uniform_(prm)
    oracle.eval()

    sd = {f"model.{k}": v.numpy() for k, v in oracle.state_dict().items()}
    variables = jax.tree.map(
        jnp.asarray, convert_state_dict(sd, "adabins", name)
    )
    model = AdaBins(
        encoder_name=name, n_bins=256, min_depth=MIN_DEPTH,
        max_depth=MAX_DEPTH,
    )
    return oracle, model, variables, rng


@pytest.mark.parametrize("name", list(ENCODERS), ids=["b-series", "v2"])
def test_adabins_converted_weights_full_forward_parity(name):
    oracle, model, variables, rng = _build_pair(name)
    b, h, w = 2, 384, 384  # dense 192x192 -> 144 patches >= 129 tokens
    img = rng.standard_normal((b, 3, h, w)).astype(np.float32) * 0.5
    with torch.no_grad():
        want_depth, want_edges = oracle(torch.from_numpy(img))

    out = model.apply(
        variables, jnp.asarray(img.transpose(0, 2, 3, 1)), train=False
    )
    np.testing.assert_allclose(
        np.asarray(out["bin_edges"]), want_edges.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["depth_pred"])[..., 0],
        want_depth.numpy()[:, 0], rtol=1e-3, atol=1e-3,
    )


@pytest.mark.parametrize("name", list(ENCODERS), ids=["b-series", "v2"])
def test_adabins_backward_parity(name):
    """End-to-end grads of the composite train loss through both stacks
    (the backward harness of test_backward_oracle.py, AdaBins family)."""
    oracle, model, variables, rng = _build_pair(name)
    b, h, w = 2, 384, 384
    img = rng.standard_normal((b, 3, h, w)).astype(np.float32) * 0.5
    gt = rng.uniform(0.0005, 9.5, (b, 1, h, w)).astype(np.float32)

    t_gt = torch.from_numpy(gt)
    t_mask = t_gt > MIN_DEPTH
    depth, edges = oracle(torch.from_numpy(img))
    t_loss = _torch_silog(depth, t_gt, t_mask) + 0.1 * _torch_bins_chamfer(
        edges, t_gt, t_mask
    )
    t_loss.backward()
    grads_sd = {}
    for k, p in oracle.named_parameters():
        grads_sd[f"model.{k}"] = (
            p.grad.detach().numpy() if p.grad is not None
            else np.zeros_like(p.detach().numpy())
        )
    for k, v in oracle.state_dict().items():
        grads_sd.setdefault(f"model.{k}", np.zeros_like(v.numpy()))
    want_grads = convert_state_dict(grads_sd, "adabins", name)["params"]

    loss_wrapper = LossWrapper(["silog", "bins_chamfer"], [1, 0.1])
    j_img = jnp.asarray(img.transpose(0, 2, 3, 1))
    j_gt = jnp.asarray(gt.transpose(0, 2, 3, 1))
    j_mask = j_gt > MIN_DEPTH

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            j_img, train=False,
        )
        return loss_wrapper(out["depth_pred"], j_gt, j_mask, out["bin_edges"])

    j_loss, j_grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    np.testing.assert_allclose(
        float(j_loss), float(t_loss.detach()), rtol=1e-4,
        err_msg="composite train loss",
    )

    flat_got = dict(jax.tree_util.tree_flatten_with_path(j_grads)[0])
    flat_want = dict(jax.tree_util.tree_flatten_with_path(want_grads)[0])
    assert set(flat_got) == set(flat_want)
    dot = got_sq = want_sq = 0.0
    for path in sorted(flat_got, key=str):
        g = np.asarray(flat_got[path], np.float64)
        w_v = np.asarray(flat_want[path], np.float64)
        err = np.linalg.norm(g - w_v)
        ref = np.linalg.norm(w_v)
        assert err <= 1e-4 * ref + 1e-9, (
            f"{jax.tree_util.keystr(path)}: ||diff||={err:.3e} vs "
            f"||ref||={ref:.3e}"
        )
        dot += float(g.ravel() @ w_v.ravel())
        got_sq += float(g.ravel() @ g.ravel())
        want_sq += float(w_v.ravel() @ w_v.ravel())
    assert dot / np.sqrt(got_sq * want_sq) > 1 - 1e-8
    assert abs(np.sqrt(got_sq / want_sq) - 1) < 1e-4
