#!/usr/bin/env python
"""Export the serving program as a model-code-free AOT artifact.

Builds the flagship GraphBins-B5 pipeline (optionally the fused
uint8->detector->depth program) and serializes it with jax.export:

    python scripts/export_serving.py -o /tmp/artifact --batch 8
    python scripts/export_serving.py -o /tmp/artifact --fused --batch 8 128 \
        --yolov7-ckpt yolov7_chkpts/yolov7-seg-lvis-e234.pt

The artifact loads with `objcavit_tpu.serving_export.ServingArtifact.load`
(or ~30 lines of jax.export.deserialize + flax msgpack_restore) — no model
code, no config system, no re-trace. Export on the deployment platform: a
TPU export bakes the Pallas/Mosaic kernels and is TPU-only; a CPU export is
pure StableHLO. See objcavit_tpu/serving_export.py.
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-o", "--out", required=True, help="artifact directory")
    ap.add_argument("--batch", type=int, nargs="+", default=[8],
                    help="batch size(s) to compile; one artifact per size")
    ap.add_argument("--hw", type=int, nargs=2, default=None,
                    metavar=("H", "W"), help="source frame dims (default: eval dims)")
    ap.add_argument("--eval-dims", type=int, nargs=2, default=[480, 640],
                    metavar=("H", "W"))
    ap.add_argument("--fused", action="store_true",
                    help="export the fused uint8->detector->depth program "
                         "(default: sentinel-objects depth pipeline)")
    ap.add_argument("--yolov7-ckpt", default=None,
                    help="YOLOv7-seg torch checkpoint for the fused detector")
    ap.add_argument("--clip-ckpt", default=None)
    ap.add_argument("--bpe", default=None, help="CLIP BPE vocab path")
    args = ap.parse_args()

    from objcavit_tpu.serving import build_flagship_pipeline, build_fused_flagship
    from objcavit_tpu.serving_export import export_artifact

    if args.fused:
        pipe = build_fused_flagship(
            eval_dims=tuple(args.eval_dims),
            yolov7_checkpoint=args.yolov7_ckpt,
            clip_checkpoint=args.clip_ckpt,
            bpe_path=args.bpe,
        )
    else:
        pipe = build_flagship_pipeline(eval_dims=tuple(args.eval_dims))
        pipe.mesh = None  # export is a single-device program

    dirs = export_artifact(
        pipe, args.out, batch_sizes=tuple(args.batch),
        hw=tuple(args.hw) if args.hw else None,
        extra_meta={"pipeline": "fused" if args.fused else "depth"},
    )
    for d in dirs:
        print(f"wrote {d}")


if __name__ == "__main__":
    main()
