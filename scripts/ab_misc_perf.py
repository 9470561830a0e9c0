#!/usr/bin/env python
"""Grab-bag of measured A/Bs for the round-3 serving campaign.

All comparisons use identical harness/dispatch structure so the ~10 ms
axon per-dispatch overhead (measured: a ~1 ms stem conv times at ~11 ms
standalone, scripts/ab_s2d_stem.py) cancels in the DIFFERENCE:

  dw      - stage4 k5 depthwise at 1056ch (8.25 vregs) vs zero-padded
            1152ch (9 vregs): is lane misalignment costing real time?
  pool    - MP maxpool 2x2 standalone (detector MPDown halves)
  resize  - nearest 2x upsample at PAN shapes (u4/u3)

Usage: python scripts/ab_misc_perf.py [batch=96] [which=dw,pool,resize]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.utils.benchkit import best_of

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    which = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ["dw", "pool", "resize"])
    rng = np.random.default_rng(0)

    def t(label, fn, *args):
        c = jax.jit(fn).lower(*args).compile()
        holder = {}

        def run():
            holder["y"] = c(*args)
            return holder["y"]

        dt = best_of(
            run,
            lambda _=None: float(jnp.sum(holder["y"].ravel()[:4].astype(jnp.float32))),
            n_iter=8,
        )
        print(json.dumps({"op": label, "ms": round(dt * 1000, 2)}), flush=True)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    def dw(x, k, stride=1):
        c = x.shape[-1]
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)

    if "dw" in which:
        t("dw5x5 1056ch@30x40", dw, arr(b, 30, 40, 1056), arr(5, 5, 1, 1056))
        t("dw5x5 1152ch@30x40", dw, arr(b, 30, 40, 1152), arr(5, 5, 1, 1152))
        t("dw3x3 240ch@120x160", dw, arr(b, 120, 160, 240), arr(3, 3, 1, 240))
        t("dw3x3 256ch@120x160", dw, arr(b, 120, 160, 256), arr(3, 3, 1, 256))

    if "cal" in which:
        # dispatch-overhead calibration: silu is pure BW (read+write 885 MB
        # at bs=96 -> ~2.2 ms at peak); anything above that is overhead
        t("silu 240ch@120x160 (cal)", jax.nn.silu, arr(b, 120, 160, 240))
        t("pw 240->40@120x160 (cal)",
          lambda x, k: jax.lax.conv_general_dilated(
              x, k, (1, 1), "VALID",
              dimension_numbers=("NHWC", "HWIO", "NHWC")),
          arr(b, 120, 160, 240), arr(1, 1, 240, 40))

    if "pool" in which:
        def mp(x):
            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

        t("maxpool2x2 256ch@120x160", mp, arr(b, 120, 160, 256))

    if "resize" in which:
        def up(x):
            n, h, w, c = x.shape
            return jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")

        t("nearest2x 256ch@15x20", up, arr(b, 15, 20, 256))
        t("nearest2x 128ch@30x40", up, arr(b, 30, 40, 128))


if __name__ == "__main__":
    main()
