"""Numeric forward-parity oracle for the EfficientNet encoder + U-Net decoder
weight import — the single largest weight blob in the model.

Hand-built torch skeletons replicate the reference's encoder/decoder semantics
with the exact state-dict naming the converter consumes:

  * encoder: gen-efficientnet ``tf_efficientnet_*`` layout
    (conv_stem/bn1/blocks.i.j.{conv_dw,bn1,se.conv_reduce,...}/conv_head) with
    TF-style asymmetric SAME padding, SE-after-depthwise ordering, BN eps 1e-3,
    SiLU — /root/reference/modules/DenseFeatureExtractor.py:141-156 wraps this
    via torch.hub.
  * decoder: the reference U-Net (DenseFeatureExtractor.py:50-118) including
    the conv2 1x1-with-padding-1 ring quirk (:57), align_corners=True skip
    resizes (:43), _net Sequential indices 0/1/3/4, LeakyReLU(0.01), BN eps
    1e-5 (torch default).

Random weights + random BN running stats are pushed through
``_convert_efficientnet`` / ``_convert_decoder`` and the flax forward must
match the torch forward at fp32 tolerance. Odd input sizes exercise the
asymmetric-padding path.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from objcavit_tpu.models.decoder import DenseFeatureExtractor
from objcavit_tpu.models.efficientnet import ENCODER_SPECS, EfficientNetEncoder
from objcavit_tpu.utils.torch_import import (
    TreeBuilder,
    _convert_decoder,
    _convert_efficientnet,
)

torch.manual_seed(0)


class Conv2dSame(tnn.Conv2d):
    """TF-style asymmetric SAME padding (timm conv2d_same.py semantics)."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.weight.shape[-2:]
        sh, sw = self.stride
        ph = max((math.ceil(ih / sh) - 1) * sh + kh - ih, 0)
        pw = max((math.ceil(iw / sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(
            x, self.weight, self.bias, self.stride, 0, self.dilation, self.groups
        )


class TorchSE(tnn.Module):
    def __init__(self, ch, se_ch):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(ch, se_ch, 1)
        self.conv_expand = tnn.Conv2d(se_ch, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = F.silu(self.conv_reduce(s))
        return x * torch.sigmoid(self.conv_expand(s))


class TorchDsBlock(tnn.Module):
    """gen-efficientnet DepthwiseSeparableConv (stage-0 block)."""

    def __init__(self, in_ch, out_ch, k, s):
        super().__init__()
        self.conv_dw = Conv2dSame(in_ch, in_ch, k, s, groups=in_ch, bias=False)
        self.bn1 = tnn.BatchNorm2d(in_ch, eps=1e-3)
        self.se = TorchSE(in_ch, max(1, in_ch // 4))
        self.conv_pw = tnn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out_ch, eps=1e-3)
        self.has_residual = s == 1 and in_ch == out_ch

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_dw(x)))
        h = self.se(h)
        h = self.bn2(self.conv_pw(h))
        return h + x if self.has_residual else h


class TorchMbBlock(tnn.Module):
    """gen-efficientnet InvertedResidual: pw-expand -> dw -> SE -> pw-linear."""

    def __init__(self, in_ch, out_ch, k, s, expand):
        super().__init__()
        mid = int(in_ch * expand)
        self.conv_pw = tnn.Conv2d(in_ch, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid, eps=1e-3)
        self.conv_dw = Conv2dSame(mid, mid, k, s, groups=mid, bias=False)
        self.bn2 = tnn.BatchNorm2d(mid, eps=1e-3)
        self.se = TorchSE(mid, max(1, int(in_ch * 0.25)))
        self.conv_pwl = tnn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out_ch, eps=1e-3)
        self.has_residual = s == 1 and in_ch == out_ch

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_pw(x)))
        h = F.silu(self.bn2(self.conv_dw(h)))
        h = self.se(h)
        h = self.bn3(self.conv_pwl(h))
        return h + x if self.has_residual else h


class TorchEncoder(tnn.Module):
    """tf_efficientnet_* skeleton with head bn2/act2 stripped, returning the
    five skip features our EfficientNetEncoder returns."""

    def __init__(self, spec):
        super().__init__()
        self.spec = spec
        self.conv_stem = Conv2dSame(3, spec.stem_channels, 3, 2, bias=False)
        self.bn1 = tnn.BatchNorm2d(spec.stem_channels, eps=1e-3)
        blocks = []
        in_ch = spec.stem_channels
        for btype, out_ch, depth, k, s, expand in spec.stages:
            stage = []
            for bi in range(depth):
                stride = s if bi == 0 else 1
                if btype == "ds":
                    stage.append(TorchDsBlock(in_ch, out_ch, k, stride))
                else:
                    stage.append(TorchMbBlock(in_ch, out_ch, k, stride, expand))
                in_ch = out_ch
            blocks.append(tnn.Sequential(*stage))
        self.blocks = tnn.Sequential(*blocks)
        self.conv_head = tnn.Conv2d(in_ch, spec.head_channels, 1, bias=False)

    def forward(self, x):
        x = F.silu(self.bn1(self.conv_stem(x)))
        skips = []
        for si, stage in enumerate(self.blocks):
            x = stage(x)
            if si in self.spec.skip_stages:
                skips.append(x)
        return skips + [self.conv_head(x)]


class TorchUpSampleWithSkip(tnn.Module):
    """Reference UpSampleWithSkip (DenseFeatureExtractor.py:30-47)."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self._net = tnn.Sequential(
            tnn.Conv2d(in_ch, out_ch, 3, 1, 1),
            tnn.BatchNorm2d(out_ch),
            tnn.LeakyReLU(),
            tnn.Conv2d(out_ch, out_ch, 3, 1, 1),
            tnn.BatchNorm2d(out_ch),
            tnn.LeakyReLU(),
        )

    def forward(self, x, skip):
        up = F.interpolate(
            x, size=skip.shape[2:], mode="bilinear", align_corners=True
        )
        return self._net(torch.cat([up, skip], dim=1))


class TorchDecoder(tnn.Module):
    """Reference Decoder (DenseFeatureExtractor.py:50-118): conv2 is a 1x1
    conv WITH padding=1 (:57 — the ring quirk), 4 up-stages, conv3."""

    def __init__(self, spec, num_classes=128):
        super().__init__()
        f = spec.head_channels
        s0, s1, s2, s3, _bott = spec.skip_channels
        self.conv2 = tnn.Conv2d(f, f, 1, 1, 1)
        self.up1 = TorchUpSampleWithSkip(f + s3, f // 2)
        self.up2 = TorchUpSampleWithSkip(f // 2 + s2, f // 4)
        self.up3 = TorchUpSampleWithSkip(f // 4 + s1, f // 8)
        self.up4 = TorchUpSampleWithSkip(f // 8 + s0, f // 16)
        self.conv3 = tnn.Conv2d(f // 16, num_classes, 3, 1, 1)

    def forward(self, features):
        skip0, skip1, skip2, skip3, bottleneck = features
        x = self.conv2(bottleneck)
        x = self.up1(x, skip3)
        x = self.up2(x, skip2)
        x = self.up3(x, skip1)
        x = self.up4(x, skip0)
        return self.conv3(x)


def _randomize(model: tnn.Module, rng: np.random.Generator):
    """Random weights + non-trivial BN running stats (catches eps/ordering
    bugs that identity stats would hide)."""
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim >= 2:  # conv/linear weights
                p.copy_(torch.from_numpy(
                    (0.25 * rng.standard_normal(tuple(p.shape)) /
                     math.sqrt(max(p.shape[1], 1))).astype(np.float32)
                ))
            elif "bn" in name and name.endswith("weight"):
                p.copy_(torch.from_numpy(
                    (1.0 + 0.2 * rng.standard_normal(tuple(p.shape))).astype(
                        np.float32)
                ))
            else:  # biases
                p.copy_(torch.from_numpy(
                    (0.1 * rng.standard_normal(tuple(p.shape))).astype(np.float32)
                ))
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.from_numpy(
                    (0.2 * rng.standard_normal(tuple(b.shape))).astype(np.float32)
                ))
            elif name.endswith("running_var"):
                b.copy_(torch.from_numpy(
                    (0.5 + rng.random(tuple(b.shape))).astype(np.float32)
                ))
    model.eval()


def _convert(encoder, decoder, encoder_name):
    sd = {f"enc.{k}": v.numpy() for k, v in encoder.state_dict().items()}
    sd.update({f"dec.{k}": v.numpy() for k, v in decoder.state_dict().items()})
    tb = TreeBuilder()
    _convert_efficientnet(tb, sd, "enc", "encoder", encoder_name)
    _convert_decoder(tb, sd, "dec", "decoder", do_final_upscale=False)
    return {"params": tb.params, "batch_stats": tb.batch_stats}


def _run_case(encoder_name, hw, rtol, atol):
    spec = ENCODER_SPECS[encoder_name]
    rng = np.random.default_rng(42)
    tenc = TorchEncoder(spec)
    tdec = TorchDecoder(spec)
    _randomize(tenc, rng)
    _randomize(tdec, rng)

    h, w = hw
    x = rng.standard_normal((2, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        t_feats = tenc(torch.from_numpy(x))
        t_out = tdec(t_feats).numpy()

    variables = _convert(tenc, tdec, encoder_name)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))

    # encoder parity, every skip level
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

    # full encoder+decoder parity
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


def test_dfe_import_forward_parity_tiny():
    """Reduced-depth b-spec (ds + mb blocks, TF-SAME, odd input size)."""
    _run_case("efficientnet-tiny", (67, 83), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dfe_import_forward_parity_b5():
    """The real flagship blob: full tf_efficientnet_b5_ap topology (39 blocks,
    2048-ch head) + its decoder, at a reduced-but-stride-valid input size."""
    _run_case("efficientnet-b5", (96, 128), rtol=2e-4, atol=2e-4)
