#!/usr/bin/env python
"""A/B bilinear-resize formulations on chip (decoder up-stage shapes).

The shipped resize (ops/resize.py) lowers each separable pass to
dot_general + a FULL MINOR-DIM TRANSPOSE of the output (HLO inspected:
(96,40960,240) -> (96,240,40960)); the transposes, not the dots, dominate
(up4.resize = 21.5 ms at 19.6%% MFU, docs/PERF.md). Variants:

  a) current: einsum("oh,nhk->nok"), einsum("ow,nhwc->nhoc")
  b) M-as-LHS: einsum("oh,nhk->onk") + major swap; einsum("ow,nhwc->onhc")
     + major swap — minor dim stays put, transposes are strided copies
  c) H-pass as matmul, W-pass via jnp.take 2-tap lerp (static indices)

Usage: python scripts/ab_resize.py [batch=96]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [  # (label, hi, wi, c, ho, wo)
    ("up3", 60, 80, 512, 120, 160),
    ("up4", 120, 160, 256, 240, 320),
]


def main():
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.ops.resize import _interp_matrix, _interp_taps
    from objcavit_tpu.utils.benchkit import best_of

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    rng = np.random.default_rng(0)
    prec = jax.lax.Precision.DEFAULT

    def timed(label, fn, *args):
        c = jax.jit(fn).lower(*args).compile()
        holder = {}

        def run():
            holder["y"] = c(*args)
            return holder["y"]

        dt = best_of(run, lambda _=None: float(
            jnp.sum(holder["y"][:, :2, :2, :8].astype(jnp.float32))
        ), n_iter=8)
        print(json.dumps({"prog": label, "ms": round(dt * 1000, 2)}), flush=True)

    for label, hi, wi, c, ho, wo in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, hi, wi, c)), jnp.bfloat16)
        mh = jnp.asarray(_interp_matrix(hi, ho, True), jnp.bfloat16)
        mw = jnp.asarray(_interp_matrix(wi, wo, True), jnp.bfloat16)

        def v_a(x, mh=mh, mw=mw, hi=hi, wi=wi, c=c, ho=ho):
            n = x.shape[0]
            y = jnp.einsum("oh,nhk->nok", mh, x.reshape(n, hi, wi * c),
                           precision=prec).reshape(n, ho, wi, c)
            return jnp.einsum("ow,nhwc->nhoc", mw, y, precision=prec)

        def v_b(x, mh=mh, mw=mw, hi=hi, wi=wi, c=c, ho=ho):
            n = x.shape[0]
            y = jnp.einsum("oh,nhk->onk", mh, x.reshape(n, hi, wi * c),
                           precision=prec)
            y = y.transpose(1, 0, 2).reshape(n, ho, wi, c)
            z = jnp.einsum("ow,nhwc->onhc", mw, y, precision=prec)
            return z.transpose(1, 2, 0, 3)

        def v_c(x, mh=mh, hi=hi, wi=wi, c=c, ho=ho, wo=wo):
            n = x.shape[0]
            y = jnp.einsum("oh,nhk->nok", mh, x.reshape(n, hi, wi * c),
                           precision=prec).reshape(n, ho, wi, c)
            lo, hi_i, frac = _interp_taps(wi, wo, True)
            fr = jnp.asarray(frac, jnp.bfloat16)[None, None, :, None]
            ylo = jnp.take(y, jnp.asarray(lo), axis=2)
            yhi = jnp.take(y, jnp.asarray(hi_i), axis=2)
            return ylo * (1 - fr) + yhi * fr

        from objcavit_tpu.ops.resize_pallas import (
            resize_bilinear_pallas,
            resize_eligible,
        )

        def v_d(x, ho=ho, wo=wo):
            return resize_bilinear_pallas(x, ho, wo)

        timed(f"{label}.a current", v_a, x)
        timed(f"{label}.b m-lhs", v_b, x)
        if resize_eligible(hi, wi, c, ho, wo):
            timed(f"{label}.d pallas-1pass", v_d, x)


if __name__ == "__main__":
    main()
