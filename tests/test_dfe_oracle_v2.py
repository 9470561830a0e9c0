"""Numeric forward-parity oracle for the torchvision EfficientNet-V2 encoder
import (``efficientnet_v2_{s,m}``) — the second encoder family the reference
supports (/root/reference/modules/DenseFeatureExtractor.py:159-168, used by
the nyu_efficientnet-v2-* and nyu_graphbins_enet-v2-m_* configs).

Hand-built torch skeletons replicate torchvision's efficientnet.py semantics
with the exact state-dict naming ``_convert_efficientnet_v2`` consumes:

  * Conv2dNormActivation children at indices 0 (conv, no bias) / 1 (BN
    eps 1e-3) / 2 (SiLU, param-free); symmetric (k-1)//2 padding ("torch"
    pad style, unlike the b-series' TF-SAME asymmetric padding).
  * FusedMBConv: 3x3 expand CNA -> 1x1 project Conv+BN (no act); the
    expand_ratio==1 block is a single 3x3 CNA (activation KEPT).
  * MBConv: 1x1 expand CNA -> dw CNA -> SqueezeExcitation(fc1/fc2,
    SiLU + sigmoid, squeeze = in_ch // 4) -> 1x1 project Conv+BN.
  * head: a full CNA whose BN+SiLU the reference KEEPS for v2 (it strips
    only avgpool/classifier, vs stripping bn2/act2 for the b-series) —
    covered by EncoderSpec.head_bn_act.

Random weights + random BN running stats are pushed through
``_convert_efficientnet_v2`` / ``_convert_decoder`` and the flax forward must
match the torch forward at fp32 tolerance. Odd input sizes exercise the
torch-padding downsample path.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from objcavit_tpu.models.decoder import DenseFeatureExtractor
from objcavit_tpu.models.efficientnet import ENCODER_SPECS, EfficientNetEncoder
from objcavit_tpu.utils.torch_import import (
    TreeBuilder,
    _convert_decoder,
    _convert_efficientnet_v2,
)
from tests.test_dfe_oracle import TorchDecoder, _randomize

torch.manual_seed(0)


def _cna(in_ch, out_ch, k, s, groups=1, act=True):
    """torchvision Conv2dNormActivation: [0]=conv (no bias), [1]=BN eps 1e-3,
    [2]=SiLU (param-free; omitted when act=False, matching
    activation_layer=None which appends no module)."""
    mods = [
        tnn.Conv2d(in_ch, out_ch, k, s, padding=(k - 1) // 2, groups=groups,
                   bias=False),
        tnn.BatchNorm2d(out_ch, eps=1e-3),
    ]
    if act:
        mods.append(tnn.SiLU(inplace=True))
    return tnn.Sequential(*mods)


class TorchVisionSE(tnn.Module):
    """torchvision ops.SqueezeExcitation with SiLU activation (as MBConv
    instantiates it): fc1/fc2 are biased 1x1 convs."""

    def __init__(self, ch, squeeze_ch):
        super().__init__()
        self.fc1 = tnn.Conv2d(ch, squeeze_ch, 1)
        self.fc2 = tnn.Conv2d(squeeze_ch, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = F.silu(self.fc1(s))
        return x * torch.sigmoid(self.fc2(s))


class TorchFusedMBConv(tnn.Module):
    def __init__(self, in_ch, out_ch, k, s, expand):
        super().__init__()
        mid = in_ch * expand
        if expand != 1:
            self.block = tnn.Sequential(
                _cna(in_ch, mid, k, s),
                _cna(mid, out_ch, 1, 1, act=False),
            )
        else:
            self.block = tnn.Sequential(_cna(in_ch, out_ch, k, s))
        self.use_res = s == 1 and in_ch == out_ch

    def forward(self, x):
        h = self.block(x)
        return h + x if self.use_res else h


class TorchV2MBConv(tnn.Module):
    def __init__(self, in_ch, out_ch, k, s, expand):
        super().__init__()
        mid = in_ch * expand
        self.block = tnn.Sequential(
            _cna(in_ch, mid, 1, 1),
            _cna(mid, mid, k, s, groups=mid),
            TorchVisionSE(mid, max(1, in_ch // 4)),
            _cna(mid, out_ch, 1, 1, act=False),
        )
        self.use_res = s == 1 and in_ch == out_ch

    def forward(self, x):
        h = self.block(x)
        return h + x if self.use_res else h


class TorchV2Encoder(tnn.Module):
    """torchvision efficientnet_v2 skeleton (features.{0..n+1} naming),
    returning the five features our EfficientNetEncoder returns — including
    the head CNA output WITH its BN+SiLU (the reference keeps them for v2)."""

    def __init__(self, spec):
        super().__init__()
        self.spec = spec
        feats = [_cna(3, spec.stem_channels, 3, 2)]
        in_ch = spec.stem_channels
        for btype, out_ch, depth, k, s, expand in spec.stages:
            stage = []
            for bi in range(depth):
                stride = s if bi == 0 else 1
                cls = TorchFusedMBConv if btype == "fused" else TorchV2MBConv
                stage.append(cls(in_ch, out_ch, k, stride, expand))
                in_ch = out_ch
            feats.append(tnn.Sequential(*stage))
        feats.append(_cna(in_ch, spec.head_channels, 1, 1))
        self.features = tnn.Sequential(*feats)

    def forward(self, x):
        x = self.features[0](x)
        skips = []
        for si in range(len(self.spec.stages)):
            x = self.features[si + 1](x)
            if si in self.spec.skip_stages:
                skips.append(x)
        return skips + [self.features[-1](x)]


def _randomize_v2(model: tnn.Module, rng: np.random.Generator):
    """_randomize detects BN scale params by 'bn' in the name; torchvision
    naming has none (features.0.1.weight), so re-draw BN scales by module
    type to keep activations at a non-degenerate magnitude."""
    _randomize(model, rng)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.weight.copy_(torch.from_numpy(
                    (1.0 + 0.2 * rng.standard_normal(
                        tuple(m.weight.shape))).astype(np.float32)
                ))
    model.eval()


def _convert(encoder, decoder, encoder_name):
    sd = {f"enc.{k}": v.numpy() for k, v in encoder.state_dict().items()}
    sd.update({f"dec.{k}": v.numpy() for k, v in decoder.state_dict().items()})
    tb = TreeBuilder()
    _convert_efficientnet_v2(tb, sd, "enc", "encoder", encoder_name)
    _convert_decoder(tb, sd, "dec", "decoder", do_final_upscale=False)
    return {"params": tb.params, "batch_stats": tb.batch_stats}


def _run_case(encoder_name, hw, rtol, atol):
    spec = ENCODER_SPECS[encoder_name]
    rng = np.random.default_rng(7)
    tenc = TorchV2Encoder(spec)
    tdec = TorchDecoder(spec)
    _randomize_v2(tenc, rng)
    _randomize(tdec, rng)

    h, w = hw
    x = rng.standard_normal((2, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        t_feats = tenc(torch.from_numpy(x))
        t_out = tdec(t_feats).numpy()

    variables = _convert(tenc, tdec, encoder_name)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))

    enc = EfficientNetEncoder(encoder_name)
    f_feats = enc.apply(
        {"params": variables["params"]["encoder"],
         "batch_stats": variables["batch_stats"]["encoder"]},
        x_nhwc, train=False,
    )
    for i, (tf_, ff) in enumerate(zip(t_feats, f_feats)):
        np.testing.assert_allclose(
            np.asarray(ff), tf_.numpy().transpose(0, 2, 3, 1),
            rtol=rtol, atol=atol, err_msg=f"encoder feature {i}",
        )

    dfe = DenseFeatureExtractor(encoder_name)
    f_out = dfe.apply(
        {"params": {"encoder": variables["params"]["encoder"],
                    "decoder": variables["params"]["decoder"]},
         "batch_stats": {"encoder": variables["batch_stats"]["encoder"],
                         "decoder": variables["batch_stats"]["decoder"]}},
        x_nhwc, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(f_out), t_out.transpose(0, 2, 3, 1), rtol=rtol, atol=atol,
        err_msg="decoder output",
    )


def test_dfe_v2_import_forward_parity_tiny():
    """Reduced v2 topology (fused + mb, torch padding, head BN+SiLU), odd
    input size."""
    _run_case("efficientnet-v2-tiny", (67, 83), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dfe_v2_import_forward_parity_v2s():
    """Full torchvision efficientnet_v2_s topology (40 blocks, 1280-ch head)
    + its decoder at a reduced-but-stride-valid input size."""
    _run_case("efficientnet-v2-s", (96, 128), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_dfe_v2_import_forward_parity_v2m():
    """Full torchvision efficientnet_v2_m topology (7 stages, 54 blocks)."""
    _run_case("efficientnet-v2-m", (67, 83), rtol=2e-4, atol=2e-4)
