#!/usr/bin/env python
"""Attribute fused-serving time: detector vs NMS vs GraphBins, FLOPs, batch sweep.

Round-3 perf campaign driver (VERDICT.md next-round #1/#4):
  * times the fused uint8->detector->NMS->embed->depth program at several
    batch sizes (the round-2 bench only measured bs=8),
  * times the detector-only and model-only stages at the same batches,
  * isolates the NMS stage cost,
  * reports XLA cost_analysis FLOPs for each program -> achieved TFLOP/s and
    MFU vs the v5e bf16 peak (197 TFLOP/s), and checks the unused proto head
    is DCE'd from the serving program (flops with vs without proto use).

Usage: python scripts/profile_fused.py [--batches 8,32,96] [--trace DIR]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFLOPS = 197.0


def flops_of(jitted, *args):
    try:
        an = jitted.lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception as e:
        print(f"  cost_analysis failed: {e}", file=sys.stderr)
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,32,96")
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument("--skip-flops", action="store_true")
    ap.add_argument("--only-fused", action="store_true",
                    help="time only the fused pipeline (each extra program "
                    "costs minutes of tunnel compile time)")
    ap.add_argument("--dims", default="480,640",
                    help="eval dims h,w — 480,640 NYU / 352,1216 KITTI "
                    "kb-crop (basicParams.yaml:136-157)")
    ap.add_argument("--class-max", default=None, choices=["0", "1"],
                    help="force the fused class-max detect head off/on "
                    "(default: auto gate by anchor count)")
    args = ap.parse_args()

    from objcavit_tpu.utils.jit_cache import enable as enable_cache

    enable_cache()
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models import GraphBins
    from objcavit_tpu.models.yolov7 import Yolov7Seg, decode_best
    from objcavit_tpu.ops.nms import batched_nms, xywh_to_xyxy
    from objcavit_tpu.serving import FusedDepthPipeline
    from objcavit_tpu.utils.benchkit import best_of, build_flagship, flagship_kwargs
    from objcavit_tpu.utils.fold_bn import fold_batchnorm

    h, w = (int(x) for x in args.dims.split(","))
    # round-4 capacity parity: min(max_det 1000, image seq len)
    from objcavit_tpu.training.steps import image_seq_len

    n_obj = min(1000, image_seq_len(h, w))  # 300 NYU / 418 KITTI
    class_max = None if args.class_max is None else args.class_max == "1"
    num_classes = 1203
    rng = np.random.default_rng(0)

    # shared model/params (build once at the largest batch, slice down)
    batches = [int(b) for b in args.batches.split(",")]
    bmax = max(batches)
    fwd, (folded, img, feats, xywh, valid) = build_flagship(bmax, h, w, n_obj)
    kw = {**flagship_kwargs(), "dims_test": (h, w)}
    fmodel = GraphBins(**kw, fold_bn=True)

    det_init = Yolov7Seg(num_classes=num_classes)
    det_vars = jax.jit(det_init.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3), jnp.float32)
    )
    det_params = fold_batchnorm(det_vars)
    det_model = Yolov7Seg(num_classes=num_classes, dtype=jnp.bfloat16, fold_bn=True)
    table = rng.standard_normal((num_classes + 1, 512)).astype(np.float32)

    frames_all = jnp.asarray(rng.integers(0, 256, (bmax, h, w, 3), dtype=np.uint8))
    holder = {}
    report = {"per_batch": {}}

    det_only = jax.jit(
        lambda p, x: det_model.apply(p, x, train=False)[0][0]
    )  # first pred level only -> forces backbone+necks, drops proto

    def det_nms(p, x01):
        preds, _proto = det_model.apply(p, x01, train=False)
        boxes, best, best_cls, _ = decode_best(preds, num_classes)
        det = batched_nms(
            xywh_to_xyxy(boxes), best, best_cls, 0.25, 0.45,
            pre_topk=256, max_det=n_obj,
        )
        return det["boxes_xyxy"], det["scores"], det["classes"], det["valid"]

    det_nms_j = jax.jit(det_nms)

    for b in batches:
        frames = frames_all[:b]
        x01f = frames.astype(jnp.float32) / 255.0
        row = {}

        # fused pipeline
        pipe = FusedDepthPipeline(
            fmodel, folded, det_model, det_params, table,
            eval_dims=(h, w), n_obj_max=n_obj, class_max_head=class_max,
        )

        def run_pipe():
            holder["p"] = pipe(frames)
            return holder["p"]

        def sync_pipe(_=None):
            float(jnp.sum(holder["p"]))

        dt = best_of(run_pipe, sync_pipe, n_iter=max(4, 128 // b))
        row["fused_ms"] = dt * 1000
        row["fused_img_per_s"] = b / dt
        if args.only_fused:
            report["per_batch"][b] = {k: round(v, 2) for k, v in row.items()}
            print(json.dumps({"batch": b, **report["per_batch"][b]}), flush=True)
            continue

        # model-only at this batch
        im, fe, xy, va = img[:b], feats[:b], xywh[:b], valid[:b]

        def run_model():
            holder["m"] = fwd(folded, im, fe, xy, va)
            return holder["m"]

        def sync_model(_=None):
            float(jnp.sum(holder["m"]["depth_pred"]))

        dtm = best_of(run_model, sync_model, n_iter=max(4, 128 // b))
        row["model_ms"] = dtm * 1000
        row["model_img_per_s"] = b / dtm

        # detector conv stack only
        def run_det():
            holder["d"] = det_only(det_params, x01f)
            return holder["d"]

        def sync_det(_=None):
            float(jnp.sum(holder["d"].astype(jnp.float32)))

        dtd = best_of(run_det, sync_det, n_iter=max(4, 128 // b))
        row["detector_ms"] = dtd * 1000

        # detector + decode + NMS (NMS cost = this minus detector)
        def run_dn():
            holder["n"] = det_nms_j(det_params, x01f)
            return holder["n"]

        def sync_dn(_=None):
            float(jnp.sum(holder["n"][1]))

        dtn = best_of(run_dn, sync_dn, n_iter=max(4, 128 // b))
        row["det_nms_ms"] = dtn * 1000
        row["nms_decode_ms"] = (dtn - dtd) * 1000

        if not args.skip_flops:
            fl_fused = flops_of(
                pipe._fns[tuple(frames.shape)], folded, det_params,
                jnp.asarray(table), frames,
            )
            fl_model = flops_of(fwd, folded, im, fe, xy, va)
            row["fused_gflops"] = fl_fused / 1e9
            row["model_gflops"] = fl_model / 1e9
            row["fused_tflops_s"] = fl_fused / dt / 1e12
            row["model_tflops_s"] = fl_model / dtm / 1e12
            row["fused_mfu_pct"] = 100 * fl_fused / dt / 1e12 / V5E_BF16_PEAK_TFLOPS
            row["model_mfu_pct"] = 100 * fl_model / dtm / 1e12 / V5E_BF16_PEAK_TFLOPS

        report["per_batch"][b] = {k: round(v, 2) for k, v in row.items()}
        print(json.dumps({"batch": b, **report["per_batch"][b]}), flush=True)

    # proto DCE check at the smallest batch: FLOPs of detector program with
    # proto USED vs the serving program (proto unused)
    if not args.skip_flops:
        b = min(batches)
        x01 = frames_all[:b].astype(jnp.float32) / 255.0

        def with_proto(p, x):
            preds, proto = det_model.apply(p, x, train=False)
            return preds[0], proto

        fl_with = flops_of(jax.jit(with_proto), det_params, x01)
        fl_without = flops_of(det_only, det_params, x01)
        report["proto_flops_delta_gflops"] = round((fl_with - fl_without) / 1e9, 2)
        print(json.dumps({
            "proto_used_gflops": round(fl_with / 1e9, 2),
            "proto_dced_gflops": round(fl_without / 1e9, 2),
        }), flush=True)

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                out = pipe(frames_all[:batches[-1]])
            float(jnp.sum(out))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
