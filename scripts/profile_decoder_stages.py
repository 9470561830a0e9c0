#!/usr/bin/env python
"""Per-op attribution of the U-Net decoder forward on TPU (bs=96, bf16).

The decoder is 248 ms of the 383 ms bs=96 flagship forward at 62% MFU —
the single biggest block. This times CUMULATIVE PREFIXES cut at each
resize / conv0 / conv1 inside the four up-stages (differences cancel
dispatch overhead), separating bilinear-resize traffic from conv time, to
decide whether a fused resize kernel is worth building.

Usage: python scripts/profile_decoder_stages.py [batch=96]
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

    from objcavit_tpu.models.decoder import ConcatSplitConv
    from objcavit_tpu.models.common import TorchConv
    from objcavit_tpu.ops.resize import resize_bilinear
    from objcavit_tpu.utils.benchkit import (
        V5E_BF16_PEAK_TFLOPS,
        best_of,
        flops_of_compiled,
    )

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    # B5 @480x640 skip pyramid (channels from ENCODER_SPECS['efficientnet-b5'])
    skips = {
        "skip0": (240, 320, 24),
        "skip1": (120, 160, 40),
        "skip2": (60, 80, 64),
        "skip3": (30, 40, 176),
    }
    bott = (15, 20, 2048)
    ups = [  # (name, skip, out_ch)
        ("up1", "skip3", 1024),
        ("up2", "skip2", 512),
        ("up3", "skip1", 256),
        ("up4", "skip0", 128),
    ]

    # each step is (label, fn(x, skips_dict, m) -> x); cut points between ops
    steps = []

    def mk_resize(name, skip):
        def f(x, sk, m):
            h, w, _ = skips[skip]
            return resize_bilinear(x, h, w, align_corners=True,
                                   precision=jax.lax.Precision.DEFAULT)

        return (f"{name}.resize", f)

    def mk_conv0(name, skip, out_ch):
        def f(x, sk, m):
            y = m(ConcatSplitConv(out_ch, (3, 3), dtype=dt,
                                  name=f"{name}_conv0"), x, sk[skip])
            return nn.leaky_relu(y, negative_slope=0.01)

        return (f"{name}.conv0", f)

    def mk_conv1(name, out_ch):
        def f(x, sk, m):
            y = m(TorchConv(out_ch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=dt, name=f"{name}_conv1"), x)
            return nn.leaky_relu(y, negative_slope=0.01)

        return (f"{name}.conv1", f)

    for name, skip, out_ch in ups:
        steps.append(mk_resize(name, skip))
        steps.append(mk_conv0(name, skip, out_ch))
        steps.append(mk_conv1(name, out_ch))

    x0 = jnp.asarray(rng.standard_normal((b, 17, 22, bott[2])), dt)  # ring'd
    sk = {
        k: jnp.asarray(rng.standard_normal((b, h, w, c)), dt)
        for k, (h, w, c) in skips.items()
    }

    class Prefix(nn.Module):
        upto: int

        @nn.compact
        def __call__(self, x, sk):
            def m(mod, *a):
                return mod(*a)

            for i, (_, f) in enumerate(steps):
                x = f(x, sk, m)
                if self.upto == i:
                    return x
            return x

    prev_ms, prev_fl = 0.0, 0.0
    rngk = jax.random.PRNGKey(0)
    for upto, (label, _) in enumerate(steps):
        mod = Prefix(upto=upto)
        variables = mod.init(rngk, x0, sk)
        c = jax.jit(lambda v, x, s: mod.apply(v, x, s)).lower(
            variables, x0, sk
        ).compile()
        holder = {}

        def run():
            holder["y"] = c(variables, x0, sk)
            return holder["y"]

        t = best_of(run, lambda _=None: float(
            jnp.sum(holder["y"][:, :2, :2, :8].astype(jnp.float32))
        ), n_iter=4)
        fl = flops_of_compiled(c)
        ms = t * 1000
        d_ms, d_fl = ms - prev_ms, fl - prev_fl
        print(json.dumps({
            "prefix": label,
            "cum_ms": round(ms, 2),
            "stage_ms": round(d_ms, 2),
            "stage_gflops_img": round(d_fl / b / 1e9, 2),
            "stage_mfu_pct": round(
                d_fl / (d_ms / 1e3) / 1e12 / V5E_BF16_PEAK_TFLOPS * 100, 1
            ) if d_ms > 0.05 else None,
            "out_shape": list(np.shape(holder["y"])),
        }), flush=True)
        prev_ms, prev_fl = ms, fl


if __name__ == "__main__":
    main()
