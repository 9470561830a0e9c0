#!/usr/bin/env python
"""A/B: MBConv epilogue (SE gate * dw_out -> project 1x1 -> +skip).

XLA materialises the gated M-channel tensor (write + read) before the
project conv; the Pallas kernel streams dw_out once. Shapes = B5 @480x640
encoder stages (bs configurable).

Usage: python scripts/ab_se_project.py [batch=96]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.ops.se_project_pallas import se_gate_project
    from objcavit_tpu.utils.benchkit import best_of

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    # (name, H, W, M=expanded, O=out, skip?) from the B5 stage table @480x640
    cases = [
        ("stage0.b1", 240, 320, 24, 24, True),   # ds block dw (in=24 via b1+)
        ("stage1.b0", 120, 160, 144, 40, False),  # stride-2 first block (dw output is /4)
        ("stage1.b1", 120, 160, 240, 40, True),
        ("stage2.b1", 60, 80, 384, 64, True),
        ("stage4.b1", 30, 40, 1056, 176, True),
    ]
    hold = {}

    for name, h, w, m, o, has_skip in cases:
        dw = jnp.asarray(rng.standard_normal((b, h, w, m)), dt)
        gate = jnp.asarray(rng.uniform(0, 1, (b, m)).astype(np.float32))
        kern = jnp.asarray(0.05 * rng.standard_normal((m, o)), dt)
        bias = jnp.asarray(0.01 * rng.standard_normal(o).astype(np.float32))
        skip = (
            jnp.asarray(rng.standard_normal((b, h, w, o)), dt)
            if has_skip else None
        )

        def xla_path(dw, gate, kern, bias, skip):
            gated = dw * gate[:, None, None, :].astype(dw.dtype)
            y = jax.lax.conv_general_dilated(
                gated, kern.reshape(1, 1, m, o), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias.astype(dw.dtype)
            return y + skip if skip is not None else y

        def pallas_path(dw, gate, kern, bias, skip):
            return se_gate_project(dw, gate, kern, bias, skip)

        args = (dw, gate, kern, bias) + ((skip,) if has_skip else (None,))
        fa = jax.jit(xla_path, static_argnums=()).lower(*args).compile() \
            if has_skip else jax.jit(
                lambda d, g, k, bi: xla_path(d, g, k, bi, None)
            ).lower(dw, gate, kern, bias).compile()
        fb = jax.jit(pallas_path).lower(*args).compile() if has_skip else \
            jax.jit(lambda d, g, k, bi: pallas_path(d, g, k, bi, None)
                    ).lower(dw, gate, kern, bias).compile()

        call_a = (lambda: fa(dw, gate, kern, bias, skip)) if has_skip else \
            (lambda: fa(dw, gate, kern, bias))
        call_b = (lambda: fb(dw, gate, kern, bias, skip)) if has_skip else \
            (lambda: fb(dw, gate, kern, bias))

        ya = np.asarray(call_a(), np.float32)
        yb = np.asarray(call_b(), np.float32)
        err = float(np.max(np.abs(ya - yb)) / (np.max(np.abs(ya)) + 1e-9))
        rows = {}
        for label, call in (("xla", call_a), ("pallas", call_b)):
            def run(call=call):
                hold["o"] = call()
                return hold["o"]

            def sync(_=None):
                float(jnp.sum(hold["o"]))

            rows[label] = best_of(run, sync, n_iter=10) * 1000
        print(
            {
                "case": name,
                "xla_ms": round(rows["xla"], 2),
                "pallas_ms": round(rows["pallas"], 2),
                "speedup": round(rows["xla"] / rows["pallas"], 2),
                "rel_err": err,
            },
            flush=True,
        )


if __name__ == "__main__":
    main()
