#!/usr/bin/env python
"""Time the constituent ops of the hot MBConv stages standalone (bs=96).

profile_encoder_stages.py pins the encoder cost in stages 0-2 and 4 (75+23 of
118 ms) at 2.5-14% MFU. This separates, per hot shape: expand 1x1, depthwise
conv (XLA), SE (pool+2 matmuls+mul), project 1x1 — plus lane-alignment probes
(dw on 240 vs 256ch, 1056 vs 1152ch) to tell relayout waste from compute floor.
Decides: fuse (Pallas expand+dw), pad channels, or accept the roofline.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.utils.benchkit import V5E_BF16_PEAK_TFLOPS, best_of

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    rng = np.random.default_rng(0)

    def t(label, fn, *args, flops=0.0):
        c = jax.jit(fn).lower(*args).compile()
        holder = {}

        def run():
            holder["y"] = c(*args)
            return holder["y"]

        dt = best_of(run, lambda _=None: float(jnp.sum(holder["y"][(0,) * holder["y"].ndim].astype(jnp.float32))), n_iter=8)
        print(json.dumps({
            "op": label, "ms": round(dt * 1000, 2),
            "tflops_s": round(flops / dt / 1e12, 1) if flops else None,
            "mfu_pct": round(flops / dt / 1e12 / V5E_BF16_PEAK_TFLOPS * 100, 1) if flops else None,
        }), flush=True)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    def pw(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def dw(x, k, stride=1):
        c = x.shape[-1]
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)

    def se(x, k1, k2):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = jax.nn.silu(pw(s, k1))
        return x * jax.nn.sigmoid(pw(s, k2))

    # ---- stage1 body blocks (x4): 120x160, 40 -> 240 -> 40 ----
    hw = (120, 160)
    x40 = arr(b, *hw, 40)
    x240 = arr(b, *hw, 240)
    npix = b * hw[0] * hw[1]
    t("s1.expand 1x1 40->240", pw, x40, arr(1, 1, 40, 240),
      flops=2 * npix * 40 * 240)
    t("s1.dw3x3 240ch", dw, x240, arr(3, 3, 1, 240),
      flops=2 * npix * 9 * 240)
    t("s1.dw3x3 256ch(aligned)", dw, arr(b, *hw, 256), arr(3, 3, 1, 256),
      flops=2 * npix * 9 * 256)
    t("s1.se 240ch", se, x240, arr(1, 1, 240, 10), arr(1, 1, 10, 240),
      flops=0)
    t("s1.project 240->40", pw, x240, arr(1, 1, 240, 40),
      flops=2 * npix * 240 * 40)
    t("s1.silu 240ch", lambda x: jax.nn.silu(x), x240, flops=0)

    # ---- stage2 body blocks (x4): 60x80, 64 -> 384 -> 64, k5 ----
    hw = (60, 80)
    npix = b * hw[0] * hw[1]
    x384 = arr(b, *hw, 384)
    t("s2.expand 1x1 64->384", pw, arr(b, *hw, 64), arr(1, 1, 64, 384),
      flops=2 * npix * 64 * 384)
    t("s2.dw5x5 384ch", dw, x384, arr(5, 5, 1, 384),
      flops=2 * npix * 25 * 384)
    t("s2.project 384->64", pw, x384, arr(1, 1, 384, 64),
      flops=2 * npix * 384 * 64)

    # ---- stage2 entry: dw5x5 s2 on 240ch at 120x160 ----
    t("s2.dw5x5 s2 240ch@120x160", lambda x, k: dw(x, k, 2),
      arr(b, 120, 160, 240), arr(5, 5, 1, 240),
      flops=2 * b * 60 * 80 * 25 * 240)

    # ---- stage4 body blocks (x6): 30x40, 176 -> 1056 -> 176, k5 ----
    hw = (30, 40)
    npix = b * hw[0] * hw[1]
    x1056 = arr(b, *hw, 1056)
    t("s4.expand 1x1 176->1056", pw, arr(b, *hw, 176), arr(1, 1, 176, 1056),
      flops=2 * npix * 176 * 1056)
    t("s4.dw5x5 1056ch", dw, x1056, arr(5, 5, 1, 1056),
      flops=2 * npix * 25 * 1056)
    t("s4.dw5x5 1152ch(aligned)", dw, arr(b, *hw, 1152), arr(5, 5, 1, 1152),
      flops=2 * npix * 25 * 1152)
    t("s4.se 1056ch", se, x1056, arr(1, 1, 1056, 44), arr(1, 1, 44, 1056),
      flops=0)
    t("s4.project 1056->176", pw, x1056, arr(1, 1, 1056, 176),
      flops=2 * npix * 1056 * 176)

    # ---- stage0 (x3): 240x320, dw3x3 48/24ch + project ----
    hw = (240, 320)
    npix = b * hw[0] * hw[1]
    t("s0.dw3x3 48ch@240x320", dw, arr(b, *hw, 48), arr(3, 3, 1, 48),
      flops=2 * npix * 9 * 48)
    t("s0.project 48->24", pw, arr(b, *hw, 48), arr(1, 1, 48, 24),
      flops=2 * npix * 48 * 24)

    # ---- stage1 entry: expand 24->144 @240x320, dw s2 144 ----
    t("s1e.expand 24->144@240x320", pw, arr(b, *hw, 24), arr(1, 1, 24, 144),
      flops=2 * npix * 24 * 144)
    t("s1e.dw3x3 s2 144ch@240x320", lambda x, k: dw(x, k, 2),
      arr(b, *hw, 144), arr(3, 3, 1, 144),
      flops=2 * b * 120 * 160 * 9 * 144)

    # ---- stem: 3x3 s2 3->48 @480x640, plus s2d formulation ----
    img = arr(b, 480, 640, 3)
    kst = arr(3, 3, 3, 48)

    def stem(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    t("stem 3x3 s2 3->48@480x640", stem, img, kst,
      flops=2 * b * 240 * 320 * 27 * 48)

    # s2d: (B,480,640,3)->(B,240,320,12); conv 2x2 12->48 VALID on padded
    def stem_s2d(x, k):
        bb, h, w, c = x.shape
        x = x.reshape(bb, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(bb, h // 2, w // 2, 4 * c)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    t("stem s2d 2x2 12->48@240x320", stem_s2d, img, arr(2, 2, 12, 48),
      flops=2 * b * 240 * 320 * 2 * 2 * 12 * 48)


if __name__ == "__main__":
    main()
