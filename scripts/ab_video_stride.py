#!/usr/bin/env python
"""Video keyframe serving (det_stride) throughput on the real chip.

FusedDepthPipeline(det_stride=K) treats the batch as a consecutive-frame
clip and runs the detector on every K-th frame, reusing each keyframe's
objects for the frames after it (serving.py). The detector stages are ~32%
of the exact fused program's time, so the expected ceiling is
1 / (0.68 + 0.32/K) of the exact throughput. This measures the real thing
at the serving-optimal batch.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from objcavit_tpu.utils.jit_cache import enable as _enable_cache

    _enable_cache()
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models import GraphBins
    from objcavit_tpu.models.yolov7 import Yolov7Seg
    from objcavit_tpu.serving import FusedDepthPipeline
    from objcavit_tpu.utils.benchkit import (
        V5E_BF16_PEAK_TFLOPS,
        best_of,
        flagship_kwargs,
        flops_of_compiled,
    )
    from objcavit_tpu.utils.fold_bn import fold_batchnorm

    batch, h, w, n_obj = 128, 480, 640, 300  # round-4 capacity parity
    num_classes = 1203
    rng = np.random.default_rng(0)

    kw = flagship_kwargs()
    model = GraphBins(**kw)
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    feats = jnp.zeros((1, n_obj, 512), jnp.float32)
    xywh = jnp.full((1, n_obj, 4), -1.0, jnp.float32)
    valid = jnp.zeros((1, n_obj), bool).at[:, 0].set(True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, feats, xywh, valid)
    folded = fold_batchnorm(variables)
    fmodel = GraphBins(**kw, fold_bn=True)

    det_init = Yolov7Seg(num_classes=num_classes)
    det_vars = jax.jit(det_init.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3), jnp.float32)
    )
    det_params = fold_batchnorm(det_vars)
    det_model = Yolov7Seg(num_classes=num_classes, dtype=jnp.bfloat16,
                          fold_bn=True)
    table = rng.standard_normal((num_classes + 1, 512)).astype(np.float32)
    frames = jnp.asarray(
        rng.integers(0, 256, (batch, h, w, 3), dtype=np.uint8)
    )

    out_holder = {}
    for stride in (1, 2, 4, 8):
        pipe = FusedDepthPipeline(
            fmodel, folded, det_model, det_params, table,
            eval_dims=(h, w), n_obj_max=n_obj, det_stride=stride,
        )
        shape = tuple(frames.shape)
        fn = pipe._fns.setdefault(shape, pipe._build(shape))
        c = fn.lower(
            pipe.variables, pipe.detector_params, pipe.class_table, frames
        ).compile()
        fl = flops_of_compiled(c)

        def run():
            out_holder["o"] = c(
                pipe.variables, pipe.detector_params, pipe.class_table, frames
            )[0]
            return out_holder["o"]

        def sync(_=None):
            float(jnp.sum(out_holder["o"]))

        dt = best_of(run, sync, n_iter=8)
        mfu = fl / dt / 1e12 / V5E_BF16_PEAK_TFLOPS * 100
        print(
            f"stride={stride}: {batch / dt:7.1f} img/s  "
            f"({fl / batch / 1e9:5.1f} GFLOPs/img, {mfu:4.1f}% MFU, "
            f"vs 250: {batch / dt / 250:5.3f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
