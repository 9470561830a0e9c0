#!/usr/bin/env python
"""Batch-size sweep for the flagship BN-folded bf16 forward (throughput is
img/s/chip — any batch size is fair for the serving metric).

Usage: python scripts/bench_sweep.py [batches...]   (default: 8 16 24 32)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _cache():
    from objcavit_tpu.utils.jit_cache import enable
    enable()


def measure(batch: int):
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models import GraphBins
    from objcavit_tpu.utils.fold_bn import fold_batchnorm

    h, w, n_obj = 480, 640, 32
    kw = dict(
        encoder_name="efficientnet-b5", n_bins=256, min_depth=0.001,
        max_depth=10.0, pos_strategy="learned_bbox_wh",
        dims_train=(416, 544), dims_test=(480, 640), dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((batch, n_obj, 512)).astype(np.float32))
    xywh = jnp.asarray(rng.uniform(0, 600, (batch, n_obj, 4)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(batch, n_obj)) < 0.5)

    model = GraphBins(**kw)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img[:1], feats[:1],
                                    xywh[:1], valid[:1])
    folded = fold_batchnorm(variables)
    fmodel = GraphBins(**kw, fold_bn=True)
    fwd = jax.jit(lambda p, *a: fmodel.apply(p, *a)["depth_pred"])

    out = fwd(folded, img, feats, xywh, valid)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(30):
            out = fwd(folded, img, feats, xywh, valid)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / 30)
    return batch / best


def main():
    _cache()
    batches = [int(x) for x in sys.argv[1:]] or [8, 16, 24, 32]
    for b in batches:
        try:
            r = measure(b)
            print(f"batch {b:3d}: {r:8.1f} img/s")
        except Exception as e:
            print(f"batch {b:3d}: FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
