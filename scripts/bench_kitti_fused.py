#!/usr/bin/env python
"""KITTI-resolution (352x1216 kb-crop) FUSED serving throughput.

Same one-XLA-program serving path as the NYU headline (uint8 -> resize ->
YOLOv7-seg -> NMS -> class-embedding gather -> GraphBins depth,
serving.FusedDepthPipeline) at the second eval protocol's resolution; the
detector runs at the full eval resolution like the reference
(Yolov7Wrapper.py:86). Prints img/s, GFLOPs/img and MFU per batch size.

Usage: python scripts/bench_kitti_fused.py [batches...]  (default: 32 48)
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
        V5E_BF16_PEAK_TFLOPS,
        best_of,
        flops_of_compiled,
    )
    from objcavit_tpu.utils.fold_bn import fold_batchnorm

    batches = [int(x) for x in sys.argv[1:]] or [32, 48]
    # n_obj 418 = capacity parity at the kb-cropped KITTI eval resolution
    # (min(max_det 1000, seq len 11*38), round 4)
    h, w, n_obj = 352, 1216, 418
    num_classes = 1203
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

    det_init = Yolov7Seg(num_classes=num_classes)
    det_vars = jax.jit(det_init.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3), jnp.float32)
    )
    det_params = fold_batchnorm(det_vars)
    det_model = Yolov7Seg(num_classes=num_classes, dtype=jnp.bfloat16,
                          fold_bn=True)
    table = rng.standard_normal((num_classes + 1, 512)).astype(np.float32)

    pipe = FusedDepthPipeline(
        model, folded, det_model, det_params, table,
        eval_dims=(h, w), n_obj_max=n_obj,
    )
    hold = {}
    for b in batches:
        frames = jnp.asarray(
            rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
        )
        shape = tuple(frames.shape)
        fn = pipe._fns.setdefault(shape, pipe._build(shape))
        c = fn.lower(
            pipe.variables, pipe.detector_params, pipe.class_table, frames
        ).compile()
        fl = flops_of_compiled(c)

        def run(c=c, frames=frames):
            hold["o"] = c(
                pipe.variables, pipe.detector_params, pipe.class_table, frames
            )[0]
            return hold["o"]

        def sync(_=None):
            float(jnp.sum(hold["o"]))

        dt = best_of(run, sync, n_iter=8)
        mfu = fl / dt / 1e12 / V5E_BF16_PEAK_TFLOPS * 100
        print(
            f"fused kitti b{b}: {b / dt:7.1f} img/s  "
            f"({fl / b / 1e9:6.1f} GFLOPs/img, {mfu:4.1f}% MFU)",
            flush=True,
        )


if __name__ == "__main__":
    main()
