#!/usr/bin/env python
"""Benchmark: flagship GraphBins-B5 NYU eval-resolution inference throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the project north star is >=2000 NYUv2 640x480 depth maps/sec on a
v5e-8 at quality parity (BASELINE.json) => 250 img/s/chip. vs_baseline is
measured img/s/chip divided by 250. The reference publishes no throughput
numbers of its own (BASELINE.md).

Timing note: jax.block_until_ready does not fully synchronise through the
axon TPU tunnel, so completion is forced with a host readback.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models import GraphBins

    batch = 8
    h, w, n_obj = 480, 640, 32
    model = GraphBins(
        encoder_name="efficientnet-b5", n_bins=256, min_depth=0.001,
        max_depth=10.0, pos_strategy="learned_bbox_wh",
        dims_train=(416, 544), dims_test=(480, 640), dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((batch, n_obj, 512)).astype(np.float32))
    xywh = jnp.asarray(rng.uniform(0, 600, (batch, n_obj, 4)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(batch, n_obj)) < 0.5)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, feats, xywh, valid)
    fwd = jax.jit(lambda p, *a: model.apply(p, *a))
    float(jnp.sum(fwd(params, img, feats, xywh, valid)["depth_pred"]))  # warm

    n_iter = 30
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fwd(params, img, feats, xywh, valid)
    float(jnp.sum(out["depth_pred"]))  # force completion (axon sync quirk)
    dt = (time.perf_counter() - t0) / n_iter

    img_per_s = batch / dt
    print(
        json.dumps(
            {
                "metric": "graphbins_b5_nyu640x480_infer_throughput_per_chip",
                "value": round(img_per_s, 1),
                "unit": "img/s",
                "vs_baseline": round(img_per_s / 250.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
