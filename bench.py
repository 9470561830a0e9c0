#!/usr/bin/env python
"""Benchmark: flagship GraphBins-B5 NYU eval-resolution inference throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline: the project north star is >=2000 NYUv2 640x480 depth maps/sec on a
v5e-8 at quality parity (BASELINE.json) => 250 img/s/chip. vs_baseline is
measured img/s/chip divided by 250. The reference publishes no throughput
numbers of its own (BASELINE.md).

Measured programs (all AOT-compiled once; XLA cost_analysis FLOPs from the
same executable power the MFU numbers):
  * value — the flagship GraphBins-B5 forward (bf16, BatchNorm folded, object
    features pre-supplied) at the throughput-optimal batch (sweep on a v5e
    chip: b8 243.6, b32 248.9, b64 248.3, b96 255.3 img/s). Round 4: the
    padded object count is the detection-capacity-parity 300 (was 32).
  * extras.serving_fused_img_per_s — the full fused serving program:
    device-resident uint8 frames -> resize/normalise -> YOLOv7-seg ->
    fixed-shape NMS -> class-embedding gather -> GraphBins depth, one XLA
    program, zero host round-trips (serving.FusedDepthPipeline), at ITS
    optimal batch (r3 sweeps: b8 152.9, b32 154.0, b96 203.5, b128 210.0,
    b160 197.6 img/s -> bs=128). Round 4: measured at the PARITY defaults —
    full dense detector head (det_topk=None, was the top-128 sparse head),
    pre_topk=min(1024, A) NMS pool (was 256), 300 object slots (was 32).
    The r3 relaxed configuration remains available as knobs; its cost is
    recorded in docs/PERF.md (scripts/ab_capacity.py).
    Detector and CLIP table are randomly initialised (weights aren't in this
    image), which does not affect op timing.
  * extras.p50_ms — median synchronised latency of one fused bs=8 batch (the
    latency a serving caller observes per dispatch, incl. the host readback).
  * extras.{model,serving}_mfu_pct — achieved TFLOP/s over the v5e bf16 peak
    (197 TFLOP/s).
  * extras.train_ms_per_step_bs8_416x544 — the fit hot loop (augment +
    forward + loss + backward + clip + AdamW), one jitted program.

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
    from objcavit_tpu.utils.benchkit import (
        V5E_BF16_PEAK_TFLOPS,
        best_of,
        build_flagship,
        flagship_kwargs,
        flops_of_compiled,
        p50_of,
    )
    from objcavit_tpu.utils.fold_bn import fold_batchnorm

    batch = 96
    serving_batch = 128  # r3 sweep: b96 203.5, b128 210.0, b160 197.6 img/s
    # n_obj 300 = detection-capacity parity, min(max_det 1000, seq len 300)
    # at 480x640 (basicParams.yaml:34 + ObjCAViT.py:191-194, round 4)
    h, w, n_obj = 480, 640, 300
    rng = np.random.default_rng(0)
    fwd, (folded, img, feats, xywh, valid) = build_flagship(batch, h, w, n_obj)
    kw = flagship_kwargs()
    fmodel = GraphBins(**kw, fold_bn=True)

    model_c = fwd.lower(folded, img, feats, xywh, valid).compile()
    model_flops = flops_of_compiled(model_c)
    out_holder = {}

    def run():
        out_holder["o"] = model_c(folded, img, feats, xywh, valid)
        return out_holder["o"]

    def sync(_=None):
        float(jnp.sum(out_holder["o"]["depth_pred"]))

    dt = best_of(run, sync)
    img_per_s = batch / dt
    model_mfu = model_flops / dt / 1e12 / V5E_BF16_PEAK_TFLOPS * 100

    # --- fused serving pipeline (uint8 -> detector -> embed -> depth) -------
    from objcavit_tpu.models.yolov7 import Yolov7Seg
    from objcavit_tpu.serving import FusedDepthPipeline

    num_classes = 1203
    frames = jnp.asarray(
        rng.integers(0, 256, (serving_batch, h, w, 3), dtype=np.uint8)
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
    # round-4 parity defaults: full dense detector head (det_topk=None),
    # pre_topk=min(1024, A) NMS pool, n_obj_max=300 capacity
    pipe = FusedDepthPipeline(
        fmodel, folded, det_model, det_params, table,
        eval_dims=(h, w), n_obj_max=n_obj,
    )
    shape = tuple(frames.shape)
    pipe_jit = pipe._fns.setdefault(shape, pipe._build(shape))
    pipe_c = pipe_jit.lower(
        pipe.variables, pipe.detector_params, pipe.class_table, frames
    ).compile()
    pipe_flops = flops_of_compiled(pipe_c)

    def run_pipe():
        # fused program returns (depth, n_candidates, pre_topk) — the
        # latter two are the saturation-observability meta
        out_holder["p"] = pipe_c(
            pipe.variables, pipe.detector_params, pipe.class_table, frames
        )[0]
        return out_holder["p"]

    def sync_pipe(_=None):
        float(jnp.sum(out_holder["p"]))

    dt_pipe = best_of(run_pipe, sync_pipe, n_iter=8)
    serving_img_per_s = serving_batch / dt_pipe
    serving_mfu = pipe_flops / dt_pipe / 1e12 / V5E_BF16_PEAK_TFLOPS * 100

    # p50 serving latency at bs=8 (the latency-oriented batch)
    b8 = 8
    frames8 = frames[:b8]
    shape8 = tuple(frames8.shape)
    pipe8 = pipe._fns.setdefault(shape8, pipe._build(shape8))

    def run_p50():
        out_holder["q"] = pipe8(
            pipe.variables, pipe.detector_params, pipe.class_table, frames8
        )[0]
        return out_holder["q"]

    def sync_p50(_=None):
        float(jnp.sum(out_holder["q"]))

    p50_batch_s = p50_of(run_p50, sync_p50)

    # --- training step (fit hot loop: aug+fwd+loss+bwd+clip+AdamW) ----------
    from objcavit_tpu.losses import LossWrapper
    from objcavit_tpu.training.optim import build_optimizer
    from objcavit_tpu.training.state import TrainState
    from objcavit_tpu.training.steps import make_train_step

    tb, th, tw = 8, 416, 544
    n_obj = 221  # train-resolution capacity: min(1000, seq len at 416x544)
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
                "p50_ms": round(p50_batch_s * 1000, 1),
                "p50_ms_per_image": round(p50_batch_s / b8 * 1000, 2),
                "model_gflops_per_img": round(model_flops / batch / 1e9, 1),
                "serving_gflops_per_img": round(
                    pipe_flops / serving_batch / 1e9, 1
                ),
                "model_mfu_pct": round(model_mfu, 1),
                "serving_mfu_pct": round(serving_mfu, 1),
                "train_ms_per_step_bs8_416x544": round(dt_train * 1000, 1),
                "train_img_per_s": round(train_img_per_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
