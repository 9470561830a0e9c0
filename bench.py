#!/usr/bin/env python
"""Benchmark: flagship GraphBins-B5 NYU eval-resolution inference throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline: the project north star is >=2000 NYUv2 640x480 depth maps/sec on a
v5e-8 at quality parity (BASELINE.json) => 250 img/s/chip. vs_baseline is
measured img/s/chip divided by 250. The reference publishes no throughput
numbers of its own (BASELINE.md).

Two numbers are measured:
  * value — the flagship GraphBins-B5 forward (bf16, BatchNorm folded, object
    features pre-supplied), the model-only throughput.
  * extras.serving_fused_img_per_s — the full fused serving program:
    device-resident uint8 frames -> resize/normalise -> YOLOv7-seg ->
    fixed-shape NMS -> class-embedding gather -> GraphBins depth, one XLA
    program, zero host round-trips (serving.FusedDepthPipeline). Detector and
    CLIP table are randomly initialised (weights aren't in this image), which
    does not affect op timing.

Timing notes: jax.block_until_ready does not fully synchronise through the
axon TPU tunnel, so completion is forced with a host readback; each
measurement takes the best of 3 trials to reject transient tunnel stalls
(observed: a one-off 20x slowdown that vanished on re-run).
"""

import json

import numpy as np


def main():
    from objcavit_tpu.utils.jit_cache import enable as _enable_cache

    _enable_cache()
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models import GraphBins
    from objcavit_tpu.utils.benchkit import best_of, build_flagship, flagship_kwargs
    from objcavit_tpu.utils.fold_bn import fold_batchnorm

    # model-only throughput at the serving-optimal batch (sweep on a v5e chip:
    # b8 243.6, b32 248.9, b64 248.3, b96 255.3 img/s — dispatch overhead
    # amortises and larger tiles schedule better); the fused serving pipeline
    # below keeps b8 to bound its compile time.
    batch = 96
    h, w, n_obj = 480, 640, 32
    rng = np.random.default_rng(0)
    fwd, (folded, img, feats, xywh, valid) = build_flagship(batch, h, w, n_obj)
    kw = flagship_kwargs()
    fmodel = GraphBins(**kw, fold_bn=True)

    out_holder = {}

    def run():
        out_holder["o"] = fwd(folded, img, feats, xywh, valid)
        return out_holder["o"]

    def sync(_=None):
        float(jnp.sum(out_holder["o"]["depth_pred"]))

    dt = best_of(run, sync)
    img_per_s = batch / dt

    # --- fused serving pipeline (uint8 -> detector -> embed -> depth) -------
    from objcavit_tpu.models.yolov7 import Yolov7Seg
    from objcavit_tpu.serving import FusedDepthPipeline

    batch = 8
    img, feats, xywh, valid = (a[:batch] for a in (img, feats, xywh, valid))
    num_classes = 1203
    frames = jnp.asarray(
        rng.integers(0, 256, (batch, h, w, 3), dtype=np.uint8)
    )  # device-resident: the tunnel's ~38 MB/s host link is not the metric
    det_init = Yolov7Seg(num_classes=num_classes)
    det_vars = jax.jit(det_init.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3), jnp.float32)
    )
    # serving detector: bf16, BN folded, RepConv branches merged (exact)
    det_params = fold_batchnorm(det_vars)
    det_model = Yolov7Seg(num_classes=num_classes, dtype=jnp.bfloat16,
                          fold_bn=True)
    table = rng.standard_normal((num_classes + 1, 512)).astype(np.float32)
    pipe = FusedDepthPipeline(
        fmodel, folded, det_model, det_params, table,
        eval_dims=(h, w), n_obj_max=n_obj,
    )

    def run_pipe():
        out_holder["p"] = pipe(frames)
        return out_holder["p"]

    def sync_pipe(_=None):
        float(jnp.sum(out_holder["p"]))

    dt_pipe = best_of(run_pipe, sync_pipe, n_iter=20)
    serving_img_per_s = batch / dt_pipe

    # --- training step (fit hot loop: aug+fwd+loss+bwd+clip+AdamW) ----------
    from objcavit_tpu.losses import LossWrapper
    from objcavit_tpu.training.optim import build_optimizer
    from objcavit_tpu.training.state import TrainState
    from objcavit_tpu.training.steps import make_train_step

    tb, th, tw = 8, 416, 544
    tbatch = {
        "image": jnp.asarray(rng.uniform(0, 1, (tb, th, tw, 3)).astype(np.float32)),
        "depth": jnp.asarray(
            rng.uniform(0.01, 9.0, (tb, th, tw, 1)).astype(np.float32)
        ),
    }
    tobjs = {
        "features": jnp.asarray(
            (0.02 * rng.standard_normal((tb, n_obj, 512))).astype(np.float32)
        ),
        "xywh": jnp.asarray(rng.uniform(0, 400, (tb, n_obj, 4)).astype(np.float32)),
        "valid": jnp.ones((tb, n_obj), bool),
    }
    tmodel = GraphBins(**kw)
    tvars = jax.jit(tmodel.init)(
        jax.random.PRNGKey(2), tbatch["image"], tobjs["features"],
        tobjs["xywh"], tobjs["valid"],
    )
    tx = build_optimizer(3.57e-4, 0.1, total_steps=100, gradient_clip_val=0.1)
    tstate = TrainState.create(tvars["params"], tvars.get("batch_stats", {}), tx)
    tstep = jax.jit(
        make_train_step(tmodel, tx, LossWrapper(["silog", "bins_chamfer"], [1, 0.1]),
                        min_depth=0.001, augment_on_device=True,
                        is_graphbins=True),
        donate_argnums=(0,),
    )
    holder = {"s": tstate}

    def run_train():
        holder["s"], holder["l"] = tstep(
            holder["s"], tbatch, tobjs, jax.random.PRNGKey(3)
        )
        return holder["l"]

    def sync_train(_=None):
        float(holder["l"])

    dt_train = best_of(run_train, sync_train, n_iter=10)
    train_img_per_s = tb / dt_train

    print(
        json.dumps(
            {
                "metric": "graphbins_b5_nyu640x480_infer_throughput_per_chip",
                "value": round(img_per_s, 1),
                "unit": "img/s",
                "vs_baseline": round(img_per_s / 250.0, 3),
                "serving_fused_img_per_s": round(serving_img_per_s, 1),
                "serving_fused_vs_baseline": round(serving_img_per_s / 250.0, 3),
                "train_ms_per_step_bs8_416x544": round(dt_train * 1000, 1),
                "train_img_per_s": round(train_img_per_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
