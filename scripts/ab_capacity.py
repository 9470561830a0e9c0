#!/usr/bin/env python
"""A/B: detection-capacity parity (N_max 32 -> 300) + NMS candidate caps.

Round-4 wiring honours yolov7seg.max_det end-to-end (N_max = min(max_det,
image seq len) = 300 at 480x640 eval, 221 at 416x544 train) and defaults the
serving detector head to the exact dense path (det_topk=None) with a
parity-safe NMS pool (pre_topk=min(1024, A), was min(256, A)). This script
measures what each axis costs on the v5e chip:

  * model-only forward, bs=96 480x640: n_obj 32 vs 300
  * train step, bs=8 416x544: n_obj 32 vs 221
  * fused serving, bs=128: the r3 relaxed config (det_topk=128, pre_topk
    256, n_obj 32) vs the round-4 parity default (dense head, pre_topk
    1024, n_obj 300), plus the two isolation points.

Results recorded in docs/PERF.md.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure_model(n_obj, batch=96):
    import jax.numpy as jnp

    from objcavit_tpu.utils.benchkit import best_of, build_flagship

    fwd, (params, img, feats, xywh, valid) = build_flagship(
        batch, 480, 640, n_obj
    )
    holder = {}

    def run():
        holder["o"] = fwd(params, img, feats, xywh, valid)
        return holder["o"]

    def sync(_=None):
        float(jnp.sum(holder["o"]["depth_pred"]))

    dt = best_of(run, sync)
    return batch / dt


def _measure_train(n_obj, tb=8, th=416, tw=544):
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.losses import LossWrapper
    from objcavit_tpu.models import GraphBins
    from objcavit_tpu.training.optim import build_optimizer
    from objcavit_tpu.training.state import TrainState
    from objcavit_tpu.training.steps import make_train_step
    from objcavit_tpu.utils.benchkit import best_of, flagship_kwargs

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (tb, th, tw, 3)).astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(0.01, 9.0, (tb, th, tw, 1)).astype(np.float32)),
    }
    objs = {
        "features": jnp.asarray(
            (0.02 * rng.standard_normal((tb, n_obj, 512))).astype(np.float32)
        ),
        "xywh": jnp.asarray(rng.uniform(0, 400, (tb, n_obj, 4)).astype(np.float32)),
        "valid": jnp.asarray(rng.uniform(size=(tb, n_obj)) < 0.3),
    }
    objs["valid"] = objs["valid"].at[:, 0].set(True)
    model = GraphBins(**flagship_kwargs())
    tvars = jax.jit(model.init)(
        jax.random.PRNGKey(2), batch["image"], objs["features"],
        objs["xywh"], objs["valid"],
    )
    tx = build_optimizer(3.57e-4, 0.1, total_steps=100, gradient_clip_val=0.1)
    state = TrainState.create(tvars["params"], tvars.get("batch_stats", {}), tx)
    step = jax.jit(
        make_train_step(model, tx, LossWrapper(["silog", "bins_chamfer"], [1, 0.1]),
                        min_depth=0.001, augment_on_device=True,
                        is_graphbins=True),
        donate_argnums=(0,),
    )
    holder = {"s": state}

    def run():
        holder["s"], holder["l"] = step(
            holder["s"], batch, objs, jax.random.PRNGKey(3)
        )
        return holder["l"]

    def sync(_=None):
        float(holder["l"])

    dt = best_of(run, sync, n_iter=10)
    return dt * 1000, tb / dt


def _measure_fused(n_obj, det_topk, pre_topk, batch=128):
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models import GraphBins
    from objcavit_tpu.models.yolov7 import Yolov7Seg
    from objcavit_tpu.serving import FusedDepthPipeline
    from objcavit_tpu.utils.benchkit import best_of, build_flagship, flagship_kwargs
    from objcavit_tpu.utils.fold_bn import fold_batchnorm

    rng = np.random.default_rng(0)
    h, w = 480, 640
    _, (folded, _, _, _, _) = build_flagship(1, h, w, n_obj)
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
        eval_dims=(h, w), n_obj_max=n_obj, det_topk=det_topk,
        pre_topk=pre_topk,
    )
    frames = jnp.asarray(
        rng.integers(0, 256, (batch, h, w, 3), dtype=np.uint8)
    )
    shape = tuple(frames.shape)
    fn = pipe._fns.setdefault(shape, pipe._build(shape))
    holder = {}

    def run():
        holder["p"] = fn(
            pipe.variables, pipe.detector_params, pipe.class_table, frames
        )[0]
        return holder["p"]

    def sync(_=None):
        float(jnp.sum(holder["p"]))

    dt = best_of(run, sync, n_iter=8)
    return batch / dt


def main():
    out = {}
    out["model_bs96_nobj32_img_per_s"] = round(_measure_model(32), 1)
    out["model_bs96_nobj300_img_per_s"] = round(_measure_model(300), 1)
    ms32, tps32 = _measure_train(32)
    ms221, tps221 = _measure_train(221)
    out["train_bs8_nobj32_ms"] = round(ms32, 1)
    out["train_bs8_nobj221_ms"] = round(ms221, 1)
    out["train_bs8_nobj221_img_per_s"] = round(tps221, 1)
    for tag, (n_obj, det_topk, pre_topk) in {
        "fused_r3_relaxed_t128_p256_n32": (32, 128, 256),
        "fused_dense_p1024_n32": (32, None, 1024),
        "fused_t128_p1024_n300": (300, 128, 1024),
        "fused_parity_dense_p1024_n300": (300, None, 1024),
    }.items():
        out[f"{tag}_img_per_s"] = round(
            _measure_fused(n_obj, det_topk, pre_topk), 1
        )
        print(json.dumps({tag: out[f"{tag}_img_per_s"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
