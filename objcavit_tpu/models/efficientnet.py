"""EfficientNet encoders (B1/B5 tf-ap variants, V2-S/M) as skip-feature pyramids.

The reference wraps timm's ``tf_efficientnet_{b1,b5}_ap`` or torchvision's
``efficientnet_v2_{s,m}`` and harvests intermediate activations by index
(modules/DenseFeatureExtractor.py:11-27,62-85). Here each encoder directly
returns the five tensors its decoder consumes:

  b5  (feature_select [4,5,6,8,11]): block0 (24ch, /2), block1 (40, /4),
      block2 (64, /8), block4 (176, /16), conv_head (2048, /32)
  b1: 16/2, 24/4, 40/8, 112/16, head 1280/32
  v2-s (feature_select [2,3,4,6,9]): stage1 (24, /2), stage2 (48, /4),
      stage3 (64, /8), stage5 (160, /16), head (1280, /32)
  v2-m: 24, 48, 80, 176, head 1280

TPU notes: NHWC, TF-style asymmetric SAME padding (flax default — identical
to the tf_* torch variants), BN eps 1e-3, SiLU. The reference strips bn2/act2
after conv_head for the b-series (DenseFeatureExtractor.py:152-156), so
conv_head has no BN/activation there; for the torchvision v2 encoders only
avgpool/classifier are stripped (:166-168) and the head Conv2dNormActivation
keeps its BN+SiLU — ``EncoderSpec.head_bn_act`` reproduces that split.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from objcavit_tpu.models.common import (
    ConvBnAct,
    DepthwiseSeparable,
    FusedMBConv,
    MBConv,
    TorchConv,
)


@dataclasses.dataclass(frozen=True)
class EncoderSpec:
    stem_channels: int
    head_channels: int
    # per stage: (block_type, out_ch, depth, kernel, stride, expand)
    stages: tuple
    skip_stages: tuple  # indices (into stages) of the 4 skip features
    skip_channels: tuple  # channels of the 4 skips + bottleneck, low-res first
    pad_style: str = "tf"  # 'tf' (tf_efficientnet_*) | 'torch' (torchvision v2)
    head_bn_act: bool = False  # v2: head keeps its BN+SiLU (see module doc)


def _round_channels(c: float) -> int:
    """EfficientNet channel rounding: nearest multiple of 8, >= 0.9x."""
    new_c = max(8, int(c + 4) // 8 * 8)
    if new_c < 0.9 * c:
        new_c += 8
    return new_c


def _scaled_depth(d: int, mult: float) -> int:
    import math

    return int(math.ceil(d * mult))


def _b_spec(width: float, depth: float) -> EncoderSpec:
    base_ch = [16, 24, 40, 80, 112, 192, 320]
    base_d = [1, 2, 2, 3, 3, 4, 1]
    kernels = [3, 3, 5, 3, 5, 5, 3]
    strides = [1, 2, 2, 2, 1, 2, 1]
    expands = [1, 6, 6, 6, 6, 6, 6]
    stages = []
    for i in range(7):
        block = "ds" if i == 0 else "mb"
        stages.append(
            (
                block,
                _round_channels(base_ch[i] * width),
                _scaled_depth(base_d[i], depth),
                kernels[i],
                strides[i],
                expands[i],
            )
        )
    stem = _round_channels(32 * width)
    head = _round_channels(1280 * width) if width > 1.0 else 1280
    return EncoderSpec(
        stem_channels=stem,
        head_channels=head,
        stages=tuple(stages),
        skip_stages=(0, 1, 2, 4),
        skip_channels=(
            stages[0][1],
            stages[1][1],
            stages[2][1],
            stages[4][1],
            head,
        ),
    )


_V2_S_STAGES = (
    ("fused", 24, 2, 3, 1, 1),
    ("fused", 48, 4, 3, 2, 4),
    ("fused", 64, 4, 3, 2, 4),
    ("mb", 128, 6, 3, 2, 4),
    ("mb", 160, 9, 3, 1, 6),
    ("mb", 256, 15, 3, 2, 6),
)
_V2_M_STAGES = (
    ("fused", 24, 3, 3, 1, 1),
    ("fused", 48, 5, 3, 2, 4),
    ("fused", 80, 5, 3, 2, 4),
    ("mb", 160, 7, 3, 2, 4),
    ("mb", 176, 14, 3, 1, 6),
    ("mb", 304, 18, 3, 2, 6),
    ("mb", 512, 5, 3, 1, 6),
)

ENCODER_SPECS = {
    "efficientnet-b5": _b_spec(1.6, 2.2),
    "efficientnet-b1": _b_spec(1.0, 1.1),
    # test/CI-only: same 7-stage topology and skip contract as the b-series
    # but one tiny block per stage — keeps multi-device train-step tests fast
    # enough for hosts where 8 virtual devices share one core
    "efficientnet-tiny": EncoderSpec(
        stem_channels=8,
        head_channels=64,
        stages=(
            ("ds", 8, 1, 3, 1, 1),
            ("mb", 16, 1, 3, 2, 2),
            ("mb", 16, 1, 3, 2, 2),
            ("mb", 24, 1, 3, 2, 2),
            ("mb", 24, 1, 3, 1, 2),
            ("mb", 32, 1, 3, 2, 2),
            ("mb", 32, 1, 3, 1, 2),
        ),
        skip_stages=(0, 1, 2, 4),
        skip_channels=(8, 16, 16, 24, 64),
    ),
    # test/CI-only: reduced v2 topology (fused + mb stages, torch padding,
    # head BN+SiLU) for fast torchvision-import oracle tests
    "efficientnet-v2-tiny": EncoderSpec(
        stem_channels=8,
        head_channels=64,
        stages=(
            ("fused", 8, 1, 3, 1, 1),
            ("fused", 16, 2, 3, 2, 4),
            ("fused", 16, 1, 3, 2, 4),
            ("mb", 24, 1, 3, 2, 4),
            ("mb", 24, 2, 3, 1, 6),
            ("mb", 32, 1, 3, 2, 6),
        ),
        skip_stages=(0, 1, 2, 4),
        skip_channels=(8, 16, 16, 24, 64),
        pad_style="torch",
        head_bn_act=True,
    ),
    "efficientnet-v2-s": EncoderSpec(
        stem_channels=24,
        head_channels=1280,
        stages=_V2_S_STAGES,
        skip_stages=(0, 1, 2, 4),
        skip_channels=(24, 48, 64, 160, 1280),
        pad_style="torch",
        head_bn_act=True,
    ),
    "efficientnet-v2-m": EncoderSpec(
        stem_channels=24,
        head_channels=1280,
        stages=_V2_M_STAGES,
        skip_stages=(0, 1, 2, 4),
        skip_channels=(24, 48, 80, 176, 1280),
        pad_style="torch",
        head_bn_act=True,
    ),
}


class EfficientNetEncoder(nn.Module):
    """Returns [skip0 (/2), skip1 (/4), skip2 (/8), skip3 (/16), bottleneck (/32)].

    V2 squeeze-excite channels are computed from the *expanded* width in
    torchvision (input_channels // 4 where input is the block's in_ch);
    B-series (timm) computes them from the block input channels — both equal
    in_ch // 4 here, matching SqueezeExcite(se_ratio * in_ch).
    """

    encoder_name: str
    drop_path_rate: float = 0.0
    fold_bn: bool = False
    fused_mbconv_head: bool = False  # Pallas expand+dw+pool (inference, TPU)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = ENCODER_SPECS[self.encoder_name]
        # s2d=True: exact space-to-depth stem rewrite (see SpaceToDepthConv;
        # the C_in=3 conv measured 15 ms / 0.7% MFU of the 118 ms bs=96
        # encoder forward). Param tree is unchanged; falls back to the plain
        # conv for odd H/W.
        x = ConvBnAct(
            spec.stem_channels, (3, 3), (2, 2), pad_style=spec.pad_style,
            fold_bn=self.fold_bn, s2d=True, dtype=self.dtype, name="stem",
        )(x, train)
        skips = []
        total_blocks = sum(s[2] for s in spec.stages)
        block_idx = 0
        for si, (btype, out_ch, depth, kernel, stride, expand) in enumerate(
            spec.stages
        ):
            for bi in range(depth):
                s = stride if bi == 0 else 1
                dpr = self.drop_path_rate * block_idx / max(total_blocks, 1)
                name = f"stage{si}_block{bi}"
                if btype == "ds":
                    x = DepthwiseSeparable(
                        out_ch, kernel, s, drop_path_rate=dpr,
                        pad_style=spec.pad_style, fold_bn=self.fold_bn,
                        dtype=self.dtype, name=name,
                    )(x, train)
                elif btype == "mb":
                    x = MBConv(
                        out_ch, expand, kernel, s, drop_path_rate=dpr,
                        pad_style=spec.pad_style, fold_bn=self.fold_bn,
                        fused_head=self.fused_mbconv_head,
                        dtype=self.dtype, name=name,
                    )(x, train)
                else:  # fused (v2)
                    x = FusedMBConv(
                        out_ch, expand, kernel, s, drop_path_rate=dpr,
                        pad_style=spec.pad_style, fold_bn=self.fold_bn,
                        dtype=self.dtype, name=name,
                    )(x, train)
                block_idx += 1
            if si in spec.skip_stages:
                skips.append(x)
        if spec.head_bn_act:
            # torchvision v2: head is a full Conv2dNormActivation and the
            # reference keeps its BN+SiLU (only avgpool/classifier stripped)
            x = ConvBnAct(
                spec.head_channels, (1, 1), fold_bn=self.fold_bn,
                dtype=self.dtype, name="conv_head",
            )(x, train)
        else:
            # b-series: reference strips the following bn2/act2
            x = TorchConv(
                spec.head_channels, (1, 1), use_bias=False, dtype=self.dtype,
                name="conv_head",
            )(x)
        return skips + [x]
