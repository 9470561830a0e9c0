#!/usr/bin/env python
"""KITTI eval-resolution (352x1216, kb-crop) flagship throughput probe.

The NYU numbers are the headline (BASELINE.json); this pins the second
eval protocol's per-chip throughput for docs/PERF.md.

Usage: python scripts/bench_kitti.py [batches...]  (default: 48 64)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models import GraphBins
    from objcavit_tpu.utils.benchkit import (
        V5E_BF16_PEAK_TFLOPS,
        best_of,
        flops_of_compiled,
    )
    from objcavit_tpu.utils.fold_bn import fold_batchnorm

    batches = [int(x) for x in sys.argv[1:]] or [48, 64]
    h, w, n_obj = 352, 1216, 418  # round-4 capacity parity
    rng = np.random.default_rng(0)
    kw = dict(
        encoder_name="efficientnet-b5", n_bins=256, min_depth=0.001,
        max_depth=80.0, pos_strategy="learned_bbox_wh",
        dims_train=(352, 704), dims_test=(h, w), dtype=jnp.bfloat16,
    )
    init_model = GraphBins(**kw)
    img1 = jnp.zeros((1, h, w, 3), jnp.float32)
    f1 = jnp.zeros((1, n_obj, 512), jnp.float32)
    x1 = jnp.full((1, n_obj, 4), -1.0, jnp.float32)
    v1 = jnp.zeros((1, n_obj), bool).at[:, 0].set(True)
    variables = jax.jit(init_model.init)(jax.random.PRNGKey(0), img1, f1, x1, v1)
    folded = fold_batchnorm(variables)
    model = GraphBins(**kw, fold_bn=True)
    fwd = jax.jit(lambda p, *a: model.apply(p, *a))
    hold = {}
    for b in batches:
        img = jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((b, n_obj, 512)).astype(np.float32))
        xywh = jnp.asarray(rng.uniform(0, 300, (b, n_obj, 4)).astype(np.float32))
        valid = jnp.asarray(rng.uniform(size=(b, n_obj)) < 0.5)
        c = fwd.lower(folded, img, feats, xywh, valid).compile()
        fl = flops_of_compiled(c)

        def run(c=c, a=(folded, img, feats, xywh, valid)):
            hold["o"] = c(*a)
            return hold["o"]

        def sync(_=None):
            float(jnp.sum(hold["o"]["depth_pred"]))

        dt = best_of(run, sync, n_iter=max(4, 256 // b))
        print(
            {
                "batch": b,
                "img_s": round(b / dt, 1),
                "ms_per_img": round(dt / b * 1000, 2),
                "gflops_per_img": round(fl / b / 1e9, 1),
                "mfu_pct": round(fl / dt / 1e12 / V5E_BF16_PEAK_TFLOPS * 100, 1),
            },
            flush=True,
        )


if __name__ == "__main__":
    main()
