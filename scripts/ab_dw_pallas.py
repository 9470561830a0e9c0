#!/usr/bin/env python
"""A/B the fused Pallas depthwise kernel (ops/dw_pallas.py) on the real chip.

Two measurements:
  micro — each eligible B5-encoder dw shape standalone: Pallas kernel vs the
          lax.conv_general_dilated + bias + SiLU + mean-pool chain it replaces.
  macro — the flagship GraphBins-B5 forward (bs configurable) with the kernel
          enabled vs disabled (dw_eligible monkeypatched to False).

Decision tool only (not driver-facing): the kernel stays in the serving path
only if the macro number wins.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def sync_fn(x=None):
    import jax
    import jax.numpy as jnp

    if x is None:
        return
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def micro(args):
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.ops.dw_pallas import dw_conv_silu_pool
    from objcavit_tpu.utils.benchkit import best_of

    # B5 @480x640 eligible dw layers (stride-1, H*W<=1200): (spatial, mid_ch, k)
    shapes = [
        ((30, 40), 672, 5),    # stage4 body (112*6)
        ((30, 40), 1056, 5),   # stage5 body (176*6)
        ((15, 20), 1824, 5),   # stage6 body (304*6)
        ((15, 20), 3072, 3),   # stage7 body (512*6)
    ]
    rng = np.random.default_rng(0)
    print(f"micro A/B at bs={args.batch} (bf16):")
    for (h, w), c, k in shapes:
        x = jnp.asarray(rng.standard_normal((args.batch, h, w, c)), jnp.bfloat16)
        wk = jnp.asarray(rng.standard_normal((k, k, 1, c)) * 0.1, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((c,)), jnp.float32)

        @jax.jit
        def ref(x, wk, b):
            y = jax.lax.conv_general_dilated(
                x, wk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
            )
            y = jax.nn.silu(y + b.astype(y.dtype))
            return y, jnp.mean(y, axis=(1, 2))

        t_ref = best_of(lambda: ref(x, wk, b), sync_fn, n_iter=args.iters)
        t_pl = best_of(
            lambda: dw_conv_silu_pool(x, wk, b, ksize=k), sync_fn, n_iter=args.iters
        )
        gb = (2 * x.size + c * k * k) * 2 / 1e9  # read+write bf16
        floor_ms = gb / 819 * 1e3  # v5e ~819 GB/s HBM
        print(
            f"  ({h},{w})x{c} k{k}: lax {t_ref*1e3:7.3f} ms  pallas {t_pl*1e3:7.3f} ms"
            f"  speedup {t_ref/t_pl:5.2f}x  (HBM floor ~{floor_ms:.3f} ms)"
        )


def macro(args):
    import jax

    import objcavit_tpu.ops.dw_pallas as dwp
    from objcavit_tpu.utils.benchkit import best_of, build_flagship

    results = {}
    for variant in ("off", "on"):
        orig = dwp.dw_eligible
        if variant == "off":
            dwp.dw_eligible = lambda *a, **k: False
        try:
            fwd, inputs = build_flagship(args.batch)
            t = best_of(lambda: fwd(*inputs), sync_fn, n_iter=args.iters)
        finally:
            dwp.dw_eligible = orig
        results[variant] = t
        print(f"macro {variant}: {t*1e3:8.2f} ms/batch  "
              f"{args.batch/t:7.1f} img/s")
    print(f"macro speedup: {results['off']/results['on']:.3f}x")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["micro", "macro", "both"], default="both")
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    if args.mode in ("micro", "both"):
        micro(args)
    if args.mode in ("macro", "both"):
        macro(args)
