#!/usr/bin/env python
"""Fused-serving batch sweep (uint8 -> detector -> embed -> depth, one
program; see serving.FusedDepthPipeline). Also takes det_topk to probe the
sparse-head candidate budget.

Usage: python scripts/sweep_fused.py [--topk K] [batches...]
       (default: --topk 128, batches 128 160)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from objcavit_tpu.utils.jit_cache import enable

    enable()
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models import GraphBins
    from objcavit_tpu.models.yolov7 import Yolov7Seg
    from objcavit_tpu.serving import FusedDepthPipeline
    from objcavit_tpu.utils.benchkit import (
        best_of,
        build_flagship,
        flagship_kwargs,
    )
    from objcavit_tpu.utils.fold_bn import fold_batchnorm

    args = sys.argv[1:]
    topk = 128
    if args and args[0] == "--topk":
        topk = int(args[1]) if args[1] != "none" else None
        args = args[2:]
    batches = [int(x) for x in args] or [128, 160]

    h, w, n_obj = 480, 640, 300  # round-4 capacity parity
    rng = np.random.default_rng(0)
    _, (folded, *_rest) = build_flagship(1, h, w, n_obj)
    fmodel = GraphBins(**flagship_kwargs(), fold_bn=True)

    num_classes = 1203
    det_init = Yolov7Seg(num_classes=num_classes)
    det_vars = jax.jit(det_init.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3), jnp.float32)
    )
    det_params = fold_batchnorm(det_vars)
    det_model = Yolov7Seg(num_classes=num_classes, dtype=jnp.bfloat16,
                          fold_bn=True)
    table = rng.standard_normal((num_classes + 1, 512)).astype(np.float32)
    pipe = FusedDepthPipeline(
        fmodel, folded, det_model, det_params, table,
        eval_dims=(h, w), n_obj_max=n_obj, det_topk=topk,
    )
    hold = {}
    for b in batches:
        frames = jnp.asarray(
            rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
        )

        def run():
            hold["o"] = pipe(frames)
            return hold["o"]

        def sync(_=None):
            float(jnp.sum(hold["o"]))

        try:
            dt = best_of(run, sync, n_iter=max(4, 1024 // b))
            print(
                f"topk={topk} batch {b:3d}: {b / dt:7.1f} img/s "
                f"({dt * 1000:.1f} ms/batch)",
                flush=True,
            )
        except Exception as e:
            print(f"topk={topk} batch {b:3d}: FAILED ({type(e).__name__}: {e})",
                  flush=True)


if __name__ == "__main__":
    main()
