#!/usr/bin/env python
"""Speed-of-light probes for the serving-ceiling argument (docs/PERF.md).

Measures, on the actual chip through the actual tunnel:
  * peak achievable bf16 matmul MFU (ideal 4096^3 dot),
  * peak achievable conv MFU on the decoder's friendliest shape,
  * HBM streaming bandwidth (x + 1 over a ~2 GB tensor, read+write),
  * the B5 encoder stage-0/1 HBM traffic ledger vs measured time.

These numbers turn the "fused 1.0x needs 57.5% sustained MFU" analysis into
a measured bound: peak-conv MFU x the program's FLOP mix caps what any
schedule of the SAME ops can reach.

Usage: python scripts/speed_of_light.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.utils.benchkit import (
        V5E_BF16_PEAK_TFLOPS,
        best_of,
    )

    hold = {}
    rng = np.random.default_rng(0)

    def timed(label, build, flops=None, gbytes=None, n_iter=20):
        fn, args = build()
        c = jax.jit(fn).lower(*args).compile()

        def run():
            hold["o"] = c(*args)
            return hold["o"]

        def sync(_=None):
            float(jnp.sum(hold["o"]))

        dt = best_of(run, sync, n_iter=n_iter)
        row = {"probe": label, "ms": round(dt * 1000, 2)}
        if flops is not None:
            row["tflops_s"] = round(flops / dt / 1e12, 1)
            row["mfu_pct"] = round(
                flops / dt / 1e12 / V5E_BF16_PEAK_TFLOPS * 100, 1
            )
        if gbytes is not None:
            row["gb_s"] = round(gbytes / dt, 1)
        print(row, flush=True)
        return dt

    # 1. ideal matmul: 4096^3 bf16
    n = 4096
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    timed(
        "matmul 4096^3 bf16",
        lambda: (lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32), (a, b)),
        flops=2.0 * n * n * n,
    )

    # 2. ideal conv: decoder-like 3x3, 512->512 @ (128, 60, 80)
    bs, h, w, cio = 128, 60, 80, 512
    x = jnp.asarray(rng.standard_normal((bs, h, w, cio)), jnp.bfloat16)
    k = jnp.asarray(0.03 * rng.standard_normal((3, 3, cio, cio)), jnp.bfloat16)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    timed(
        "conv3x3 512->512 @128x60x80 bf16",
        lambda: (conv, (x, k)),
        flops=2.0 * 9 * cio * cio * bs * h * w,
    )

    # 3. conv at the up4.conv0 x-part shape (256->128 @ 240x320, bs=96)
    bs2, h2, w2 = 96, 240, 320
    x2 = jnp.asarray(rng.standard_normal((bs2, h2, w2, 256)), jnp.bfloat16)
    k2 = jnp.asarray(0.03 * rng.standard_normal((3, 3, 256, 128)), jnp.bfloat16)
    timed(
        "conv3x3 256->128 @96x240x320 bf16 (up4.conv0 x-part)",
        lambda: (conv, (x2, k2)),
        flops=2.0 * 9 * 256 * 128 * bs2 * h2 * w2,
    )

    # 4. HBM streaming: x + 1 over ~2 GB (read + write)
    m = jnp.asarray(rng.standard_normal((96, 240, 320, 144)), jnp.bfloat16)
    nbytes = float(m.size) * 2
    timed(
        "stream x+1 over 2.1 GB bf16",
        lambda: ((lambda t: t + jnp.bfloat16(1.0)), (m,)),
        gbytes=2 * nbytes / 1e9,
        n_iter=30,
    )


if __name__ == "__main__":
    main()
