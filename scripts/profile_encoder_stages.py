#!/usr/bin/env python
"""Per-stage attribution of the EfficientNet-B5 encoder forward on TPU.

The encoder measures 12.1% MFU at bs=96 (profile_model_stages.py) while the
decoder, with 10x the FLOPs, hits 62% — so the encoder is the efficiency
hole of the flagship forward. This times CUMULATIVE PREFIXES of the encoder
(stem, stem+stage0, ..., +conv_head) so stage cost = difference, and prints
per-stage FLOPs from cost_analysis. Guides whether the fix is layout
(space-to-depth early stages), fusion (Pallas MBConv), or nothing.

Usage: python scripts/profile_encoder_stages.py [batch=96]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models.common import ConvBnAct, DepthwiseSeparable, MBConv, TorchConv
    from objcavit_tpu.models.efficientnet import ENCODER_SPECS
    from objcavit_tpu.utils.benchkit import (
        V5E_BF16_PEAK_TFLOPS,
        best_of,
        flops_of_compiled,
    )

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    h, w = 480, 640
    spec = ENCODER_SPECS["efficientnet-b5"]
    dt = jnp.bfloat16

    class Prefix(nn.Module):
        """Encoder truncated after `upto` units (0=stem, 1..7=stages, 8=head)."""

        upto: int

        @nn.compact
        def __call__(self, x):
            x = ConvBnAct(
                spec.stem_channels, (3, 3), (2, 2), pad_style=spec.pad_style,
                fold_bn=True, dtype=dt, name="stem",
            )(x, False)
            if self.upto == 0:
                return x
            for si, (btype, out_ch, depth, kernel, stride, expand) in enumerate(
                spec.stages
            ):
                for bi in range(depth):
                    s = stride if bi == 0 else 1
                    name = f"stage{si}_block{bi}"
                    if btype == "ds":
                        x = DepthwiseSeparable(
                            out_ch, kernel, s, pad_style=spec.pad_style,
                            fold_bn=True, dtype=dt, name=name,
                        )(x, False)
                    else:
                        x = MBConv(
                            out_ch, expand, kernel, s, pad_style=spec.pad_style,
                            fold_bn=True, dtype=dt, name=name,
                        )(x, False)
                if self.upto == si + 1:
                    return x
            return TorchConv(
                spec.head_channels, (1, 1), use_bias=False, dtype=dt,
                name="conv_head",
            )(x)

    rng = jax.random.PRNGKey(0)
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, h, w, 3)), jnp.bfloat16
    )

    labels = ["stem"] + [f"stage{i}" for i in range(7)] + ["conv_head"]
    prev_ms, prev_fl = 0.0, 0.0
    for upto, label in enumerate(labels):
        m = Prefix(upto=upto)
        variables = m.init(rng, img)
        c = jax.jit(lambda v, x: m.apply(v, x)).lower(variables, img).compile()
        holder = {}

        def run():
            holder["y"] = c(variables, img)
            return holder["y"]

        t = best_of(run, lambda _=None: float(jnp.sum(holder["y"].astype(jnp.float32))),
                    n_iter=max(4, 128 // b))
        fl = flops_of_compiled(c)
        ms = t * 1000
        d_ms, d_fl = ms - prev_ms, fl - prev_fl
        print(json.dumps({
            "prefix": label,
            "cum_ms": round(ms, 2),
            "stage_ms": round(d_ms, 2),
            "stage_gflops_img": round(d_fl / b / 1e9, 2),
            "stage_tflops_s": round(d_fl / (d_ms / 1e3) / 1e12, 1) if d_ms > 0.05 else None,
            "stage_mfu_pct": round(d_fl / (d_ms / 1e3) / 1e12 / V5E_BF16_PEAK_TFLOPS * 100, 1) if d_ms > 0.05 else None,
            "out_shape": list(np.shape(holder["y"])),
        }), flush=True)
        prev_ms, prev_fl = ms, fl


if __name__ == "__main__":
    main()
