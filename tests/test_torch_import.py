"""Checkpoint-converter tests: synthesize a reference-shaped state_dict and
check the converted tree loads into the flax models (structure + shapes),
plus numeric parity of converted transformer weights."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from objcavit_tpu.models import AdaBins, GraphBins
from objcavit_tpu.models.efficientnet import ENCODER_SPECS
from objcavit_tpu.models.layers import TransformerEncoder
from objcavit_tpu.utils.torch_import import TreeBuilder, convert_state_dict

RNG = np.random.default_rng(11)
H, W = 64, 96


def _tshape(rng, *shape):
    # small scale: unit-normal weights overflow fp32 through ~200 layers
    return (rng.standard_normal(shape) * 0.02).astype(np.float32)


def _add_conv(sd, key, cin, cout, k, bias=True, depthwise=False):
    if depthwise:
        sd[f"{key}.weight"] = _tshape(RNG, cout, 1, k, k)
    else:
        sd[f"{key}.weight"] = _tshape(RNG, cout, cin, k, k)
    if bias:
        sd[f"{key}.bias"] = _tshape(RNG, cout)


def _add_bn(sd, key, c):
    sd[f"{key}.weight"] = _tshape(RNG, c)
    sd[f"{key}.bias"] = _tshape(RNG, c)
    sd[f"{key}.running_mean"] = _tshape(RNG, c)
    sd[f"{key}.running_var"] = np.abs(_tshape(RNG, c)) + 0.5


def _add_linear(sd, key, cin, cout):
    sd[f"{key}.weight"] = _tshape(RNG, cout, cin)
    sd[f"{key}.bias"] = _tshape(RNG, cout)


def _add_mha(sd, key, e):
    sd[f"{key}.in_proj_weight"] = _tshape(RNG, 3 * e, e)
    sd[f"{key}.in_proj_bias"] = _tshape(RNG, 3 * e)
    sd[f"{key}.out_proj.weight"] = _tshape(RNG, e, e)
    sd[f"{key}.out_proj.bias"] = _tshape(RNG, e)


def _add_encoder_layer(sd, key, e=128, ff=1024):
    _add_mha(sd, f"{key}.self_attn", e)
    _add_linear(sd, f"{key}.linear1", e, ff)
    _add_linear(sd, f"{key}.linear2", ff, e)
    for norm in ("norm1", "norm2"):
        sd[f"{key}.{norm}.weight"] = _tshape(RNG, e)
        sd[f"{key}.{norm}.bias"] = _tshape(RNG, e)


def _add_transformer(sd, key, layers=4):
    for i in range(layers):
        _add_encoder_layer(sd, f"{key}.layers.{i}")


def _make_encoder_sd(sd, prefix, name):
    spec = ENCODER_SPECS[name]
    _add_conv(sd, f"{prefix}.conv_stem", 3, spec.stem_channels, 3, bias=False)
    _add_bn(sd, f"{prefix}.bn1", spec.stem_channels)
    cin = spec.stem_channels
    for si, (btype, out, depth, k, _s, expand) in enumerate(spec.stages):
        for bi in range(depth):
            t = f"{prefix}.blocks.{si}.{bi}"
            se = max(1, int(cin * 0.25))
            if btype == "ds":
                _add_conv(sd, f"{t}.conv_dw", cin, cin, k, bias=False,
                          depthwise=True)
                _add_bn(sd, f"{t}.bn1", cin)
                _add_conv(sd, f"{t}.se.conv_reduce", cin, se, 1)
                _add_conv(sd, f"{t}.se.conv_expand", se, cin, 1)
                _add_conv(sd, f"{t}.conv_pw", cin, out, 1, bias=False)
                _add_bn(sd, f"{t}.bn2", out)
            else:
                mid = int(cin * expand)
                _add_conv(sd, f"{t}.conv_pw", cin, mid, 1, bias=False)
                _add_bn(sd, f"{t}.bn1", mid)
                _add_conv(sd, f"{t}.conv_dw", mid, mid, k, bias=False,
                          depthwise=True)
                _add_bn(sd, f"{t}.bn2", mid)
                _add_conv(sd, f"{t}.se.conv_reduce", mid, se, 1)
                _add_conv(sd, f"{t}.se.conv_expand", se, mid, 1)
                _add_conv(sd, f"{t}.conv_pwl", mid, out, 1, bias=False)
                _add_bn(sd, f"{t}.bn3", out)
            cin = out
    _add_conv(sd, f"{prefix}.conv_head", cin, spec.head_channels, 1, bias=False)


def _make_decoder_sd(sd, prefix, name):
    spec = ENCODER_SPECS[name]
    nf = spec.head_channels
    sk = spec.skip_channels
    _add_conv(sd, f"{prefix}.conv2", nf, nf, 1)
    chans = [
        (nf + sk[3], nf // 2),
        (nf // 2 + sk[2], nf // 4),
        (nf // 4 + sk[1], nf // 8),
        (nf // 8 + sk[0], nf // 16),
    ]
    for up, (cin, cout) in zip(("up1", "up2", "up3", "up4"), chans):
        _add_conv(sd, f"{prefix}.{up}._net.0", cin, cout, 3)
        _add_bn(sd, f"{prefix}.{up}._net.1", cout)
        _add_conv(sd, f"{prefix}.{up}._net.3", cout, cout, 3)
        _add_bn(sd, f"{prefix}.{up}._net.4", cout)
    _add_conv(sd, f"{prefix}.conv3", nf // 16, 128, 3)


def _make_regressor_sd(sd, prefix, dim_out):
    _add_linear(sd, f"{prefix}.0", 128, 256)
    _add_linear(sd, f"{prefix}.2", 256, 256)
    _add_linear(sd, f"{prefix}.4", 256, dim_out)


def _shapes(tree):
    return jax.tree.map(lambda x: tuple(np.shape(x)), tree)


def test_graphbins_state_dict_converts_and_loads():
    n_bins = 16
    sd = {}
    _make_encoder_sd(sd, "model.dense_feature_extractor.encoder.original_model",
                     "efficientnet-b1")
    _make_decoder_sd(sd, "model.dense_feature_extractor.decoder",
                     "efficientnet-b1")
    oc = "model.objcavit"
    for i, (cin, cout) in enumerate(((4, 32), (32, 64), (64, 128), (128, 256),
                                     (256, 128))):
        _add_linear(sd, f"{oc}.positional_encoder.{2 * i}", cin, cout)
    _add_conv(sd, f"{oc}.image_embedding_convPxP", 128, 128, 16)
    _add_linear(sd, f"{oc}.obj_embedding_layer", 512, 128)
    _add_transformer(sd, f"{oc}.saca_1.image_transformer_encoder")
    _add_transformer(sd, f"{oc}.saca_1.obj_transformer_encoder")
    _add_mha(sd, f"{oc}.saca_1.cross_attn_obj_im", 128)
    _add_mha(sd, f"{oc}.saca_1.cross_attn_im_obj", 128)
    _add_conv(sd, f"{oc}.conv3x3", 128, 128, 3)
    _make_regressor_sd(sd, f"{oc}.regressor", n_bins)
    # at this tiny resolution the image sequence is S = (H/32)*(W/32) = 6, so
    # only S-1 = 5 query channels reach conv_out (slice :129 of 6 tokens)
    n_queries = min(128, (H // 32) * (W // 32) - 1)
    _add_conv(sd, "model.conv_out.0", n_queries, n_bins, 1)

    variables = convert_state_dict(
        sd, model_name="graphbins", encoder_name="efficientnet-b1",
        pos_strategy="learned_bbox_wh",
    )

    model = GraphBins(
        encoder_name="efficientnet-b1", n_bins=n_bins, min_depth=0.001,
        max_depth=10.0, pos_strategy="learned_bbox_wh",
        dims_train=(H, W), dims_test=(H, W),
    )
    img = jnp.asarray(RNG.standard_normal((1, H, W, 3)).astype(np.float32))
    feats = jnp.zeros((1, 2, 512), jnp.float32)
    xywh = jnp.asarray(RNG.uniform(0, 50, (1, 2, 4)).astype(np.float32))
    valid = jnp.ones((1, 2), bool)
    ref = model.init(jax.random.PRNGKey(0), img, feats, xywh, valid)

    # exact structural + shape match against a fresh init
    assert _shapes(ref["params"]) == _shapes(variables["params"])
    assert _shapes(ref["batch_stats"]) == _shapes(variables["batch_stats"])

    # and the converted weights actually run
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        img, feats, xywh, valid,
    )
    assert np.isfinite(np.asarray(out["depth_pred"])).all()


def test_converted_transformer_matches_torch_numerically():
    torch.manual_seed(3)
    tlayer = nn.TransformerEncoderLayer(128, 4, dim_feedforward=1024,
                                        batch_first=True)
    tenc = nn.TransformerEncoder(tlayer, num_layers=2,
                                 enable_nested_tensor=False).eval()
    sd = {f"enc.{k}": v.detach().numpy() for k, v in tenc.state_dict().items()}

    tb = TreeBuilder()
    tb.transformer(sd, "enc", "enc", layers=2)

    x = RNG.standard_normal((2, 5, 128)).astype(np.float32)
    with torch.no_grad():
        want = tenc(torch.from_numpy(x)).numpy()
    enc = TransformerEncoder(2, 128, 4, 1024)
    got = enc.apply({"params": tb.params["enc"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
