#!/usr/bin/env python
"""p50 single-dispatch latency of the fused serving program at small batches.

The throughput numbers (bench.py, docs/PERF.md) run at the throughput-optimal
batch; a latency-sensitive caller instead dispatches one small batch and
waits. This measures the median synchronised wall time of one fused dispatch
(uint8 -> resize/norm -> YOLOv7-seg -> NMS -> embed -> GraphBins depth,
host readback included) at bs=1..8.

Usage: python scripts/p50_latency.py [batches...]   (default: 1 2 8)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models import GraphBins
    from objcavit_tpu.models.yolov7 import Yolov7Seg
    from objcavit_tpu.serving import FusedDepthPipeline
    from objcavit_tpu.utils.benchkit import (
        build_flagship,
        flagship_kwargs,
        p50_of,
    )
    from objcavit_tpu.utils.fold_bn import fold_batchnorm

    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 8]
    h, w, n_obj, num_classes = 480, 640, 300, 1203  # round-4 capacity parity
    rng = np.random.default_rng(0)
    _, (folded, *_rest) = build_flagship(1, h, w, n_obj)
    fmodel = GraphBins(**flagship_kwargs(), fold_bn=True)
    det_init = Yolov7Seg(num_classes=num_classes)
    det_vars = jax.jit(det_init.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3), jnp.float32)
    )
    det_params = fold_batchnorm(det_vars)
    det_model = Yolov7Seg(
        num_classes=num_classes, dtype=jnp.bfloat16, fold_bn=True
    )
    table = rng.standard_normal((num_classes + 1, 512)).astype(np.float32)
    pipe = FusedDepthPipeline(
        fmodel, folded, det_model, det_params, table,
        eval_dims=(h, w), n_obj_max=n_obj,
    )

    for b in batches:
        frames = jnp.asarray(
            rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
        )
        shape = tuple(frames.shape)
        fn = pipe._fns.setdefault(shape, pipe._build(shape))
        holder = {}

        def run():
            holder["o"] = fn(
                pipe.variables, pipe.detector_params, pipe.class_table, frames
            )[0]
            return holder["o"]

        def sync(_=None):
            float(jnp.sum(holder["o"]))

        p50 = p50_of(run, sync)
        print(
            f"fused p50 b{b}: {p50 * 1e3:7.1f} ms/dispatch "
            f"({p50 / b * 1e3:6.2f} ms/img)"
        )


if __name__ == "__main__":
    main()
