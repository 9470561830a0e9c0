#!/usr/bin/env python
"""A/B the batch-in-sublanes fused MBConv head vs the unfused XLA composition.

Shapes = the B5 body blocks with a VMEM-fitting plan (stages 1/2/3/6;
docs/PERF.md stage table). Three timings per shape:
  * XLA NHWC — the unfused composition the kernel replaces (expand conv +
    SiLU + dw conv + SiLU + pool sum), reading/writing XLA's native layout.
  * pallas HWBC — the fused kernel on a device-resident (H, W, B, C) input,
    i.e. the steady-state cost inside an HWBC-chained stage.
  * transposes — the (H,W,B,Cin) in / (H,W,B,Cout) out HBM transposes of the
    SMALL tensors, to price the chain's entry/exit overhead separately.

Usage: python scripts/ab_mbconv_bs.py [batch=96]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SHAPES = [  # (label, h, w, cin, m, k)
    ("stage1 body", 120, 160, 40, 240, 3),
    ("stage2 body", 60, 80, 64, 384, 5),
    ("stage3 body", 30, 40, 128, 768, 3),
    ("stage6 body", 15, 20, 512, 3072, 3),
]


def main():
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.ops.mbconv_bs import mbconv_bs_expand_dw_pool
    from objcavit_tpu.utils.benchkit import best_of

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    rng = np.random.default_rng(0)

    def timed(label, fn, *args):
        c = jax.jit(fn).lower(*args).compile()
        holder = {}

        def run():
            holder["y"] = c(*args)
            return holder["y"]

        dt = best_of(
            run,
            lambda _=None: float(
                jnp.sum(jax.tree_util.tree_leaves(holder["y"])[-1][0, :8])
            ),
            n_iter=8,
        )
        print(json.dumps({"prog": label, "ms": round(dt * 1000, 2)}), flush=True)
        return dt

    def xla_side(x, we, be, wd, bd, k):
        h = jax.lax.conv_general_dilated(
            x, we[None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + be.astype(x.dtype)
        h = jax.nn.silu(h)
        h = jax.lax.conv_general_dilated(
            h, wd, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=h.shape[-1],
        ) + bd.astype(x.dtype)
        h = jax.nn.silu(h)
        return h, jnp.sum(h.astype(jnp.float32), axis=(1, 2))

    for label, h, w, cin, m, k in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
        we = jnp.asarray(0.2 * rng.standard_normal((cin, m)), jnp.bfloat16)
        be = jnp.asarray(0.1 * rng.standard_normal((m,)), jnp.float32)
        wd = jnp.asarray(0.2 * rng.standard_normal((k, k, 1, m)), jnp.bfloat16)
        bd = jnp.asarray(0.1 * rng.standard_normal((m,)), jnp.float32)
        x_t = jnp.transpose(x, (1, 2, 0, 3))
        x_t = jax.block_until_ready(x_t)

        t_x = timed(f"{label} XLA", lambda *a: xla_side(*a, k), x, we, be, wd, bd)
        t_p = timed(
            f"{label} pallas-bs",
            lambda *a: mbconv_bs_expand_dw_pool(*a, ksize=k),
            x_t, we, be, wd, bd,
        )
        t_t = timed(
            f"{label} small transposes",
            lambda u: (
                jnp.transpose(jnp.transpose(u, (1, 2, 0, 3)), (2, 0, 1, 3)),
                jnp.zeros((1, 8), jnp.float32),
            ),
            x,
        )
        print(
            json.dumps(
                {
                    "shape": label,
                    "speedup": round(t_x / t_p, 2),
                    "speedup_with_transposes": round(t_x / (t_p + t_t), 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
