#!/usr/bin/env python
"""A/B: decoder skip convs (3x3, small C_in) direct vs kw-unfolded.

The up-stage skip convs contract tiny channel counts (24/40/64/176) against
the 128-deep MXU: occupancy C_in/128 wastes most of the systolic array
(profiled: up4's 24-ch skip conv ~10.5 ms of a 39.4 ms conv0 at bs=96 for
8% of its FLOPs). kw-unfolding concatenates the 3 width-shifted copies so
the conv becomes (3,1) with K = 3*C_in — 3x the MXU occupancy for one extra
materialisation of a small tensor.

Usage: python scripts/ab_skip_unfold.py [batch=96]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.utils.benchkit import best_of

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    # (name, H, W, Cs, Cout) for the four B5 up-stages @480x640
    cases = [
        ("up1", 30, 40, 176, 1024),
        ("up2", 60, 80, 64, 512),
        ("up3", 120, 160, 40, 256),
        ("up4", 240, 320, 24, 128),
    ]
    hold = {}

    def direct(skip, kern):
        return jax.lax.conv_general_dilated(
            skip, kern, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def unfolded(skip, kern):
        # u[., j, (dj, c)] = skip[., j + dj - 1, c]; conv (3,1) with K=3*Cs
        pad = jnp.pad(skip, ((0, 0), (0, 0), (1, 1), (0, 0)))
        w = skip.shape[2]
        u = jnp.concatenate(
            [pad[:, :, 0:w], pad[:, :, 1 : w + 1], pad[:, :, 2 : w + 2]],
            axis=-1,
        )
        kh, kw, cs, co = kern.shape
        # (kh, kw, cs, co) -> (kh, 1, kw*cs, co): kw-major flatten matches
        # u's channel order (dj*cs + c)
        k2 = kern.reshape(kh, 1, kw * cs, co)
        return jax.lax.conv_general_dilated(
            u, k2, (1, 1), ((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    for name, h, w, cs, co in cases:
        skip = jnp.asarray(rng.standard_normal((b, h, w, cs)), dt)
        kern = jnp.asarray(0.05 * rng.standard_normal((3, 3, cs, co)), dt)

        fa = jax.jit(direct).lower(skip, kern).compile()
        fb = jax.jit(unfolded).lower(skip, kern).compile()
        # parity first
        ya = np.asarray(fa(skip, kern), np.float32)
        yb = np.asarray(fb(skip, kern), np.float32)
        err = np.max(np.abs(ya - yb)) / (np.max(np.abs(ya)) + 1e-9)
        rows = {}
        for label, f in (("direct", fa), ("unfold", fb)):
            def run(f=f):
                hold["o"] = f(skip, kern)
                return hold["o"]

            def sync(_=None):
                float(jnp.sum(hold["o"]))

            dtm = best_of(run, sync, n_iter=10)
            rows[label] = dtm * 1000
        print(
            {
                "case": name,
                "direct_ms": round(rows["direct"], 2),
                "unfold_ms": round(rows["unfold"], 2),
                "speedup": round(rows["direct"] / rows["unfold"], 2),
                "rel_err": float(err),
            }
        )


if __name__ == "__main__":
    main()
