#!/usr/bin/env python
"""Stage-level attribution of the flagship GraphBins-B5 forward on TPU.

Times three nested programs at the serving batch (bf16, BN folded):
  encoder only -> encoder+decoder -> full model (incl. ObjCAViT + bins head)
so stage cost = difference. Guides the round-3 model-forward optimisation
(fused serving needs the model at ~2.4 ms/img; it measures ~4.0).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models.decoder import Decoder
    from objcavit_tpu.models.efficientnet import EfficientNetEncoder
    from objcavit_tpu.utils.benchkit import (
        V5E_BF16_PEAK_TFLOPS,
        best_of,
        build_flagship,
        flops_of_compiled,
    )

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    h, w, n_obj = 480, 640, 300  # round-4 capacity parity
    fwd, (folded, img, feats, xywh, valid) = build_flagship(b, h, w, n_obj)

    name = "efficientnet-b5"
    enc = EfficientNetEncoder(name, fold_bn=True, dtype=jnp.bfloat16)
    dec = Decoder(name, fold_bn=True, dtype=jnp.bfloat16)
    enc_vars = {"params": folded["params"]["dense_feature_extractor"]["encoder"]}
    dec_vars = {"params": folded["params"]["dense_feature_extractor"]["decoder"]}

    enc_c = jax.jit(
        lambda v, x: enc.apply(v, x, train=False)
    ).lower(enc_vars, img).compile()

    def encdec(ev, dv, x):
        f = enc.apply(ev, x, train=False)
        return dec.apply(dv, f, x, train=False)

    encdec_c = jax.jit(encdec).lower(enc_vars, dec_vars, img).compile()
    full_c = fwd.lower(folded, img, feats, xywh, valid).compile()

    holder = {}
    rows = {}

    def timed(label, runner, syncer, fl):
        dt = best_of(runner, syncer, n_iter=max(4, 128 // b))
        rows[label] = {
            "ms": round(dt * 1000, 2),
            "ms_per_img": round(dt / b * 1000, 3),
            "gflops_per_img": round(fl / b / 1e9, 1),
            "tflops_s": round(fl / dt / 1e12, 1),
            "mfu_pct": round(fl / dt / 1e12 / V5E_BF16_PEAK_TFLOPS * 100, 1),
        }
        print(json.dumps({"stage": label, **rows[label]}), flush=True)

    def run_enc():
        holder["e"] = enc_c(enc_vars, img)
        return holder["e"]

    timed("encoder", run_enc,
          lambda _=None: float(jnp.sum(holder["e"][-1].astype(jnp.float32))),
          flops_of_compiled(enc_c))

    def run_ed():
        holder["d"] = encdec_c(enc_vars, dec_vars, img)
        return holder["d"]

    timed("encoder+decoder", run_ed,
          lambda _=None: float(jnp.sum(holder["d"].astype(jnp.float32))),
          flops_of_compiled(encdec_c))

    def run_full():
        holder["f"] = full_c(folded, img, feats, xywh, valid)
        return holder["f"]

    timed("full_model", run_full,
          lambda _=None: float(jnp.sum(holder["f"]["depth_pred"])),
          flops_of_compiled(full_c))


if __name__ == "__main__":
    main()
