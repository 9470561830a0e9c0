#!/usr/bin/env python
"""A/B the attention implementation (XLA einsum vs fused Pallas MHA) on the
flagship GraphBins-B5 forward, on whatever backend is live.

Decides the production default for `attn_impl` with measured numbers instead
of claims (round-1 VERDICT weak #3).

Usage: python scripts/ab_attention.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _cache():
    from objcavit_tpu.utils.jit_cache import enable
    enable()


def measure(attn_impl: str, batch: int = 8):
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models import GraphBins
    from objcavit_tpu.utils.fold_bn import fold_batchnorm

    h, w, n_obj = 480, 640, 32
    kw = dict(
        encoder_name="efficientnet-b5", n_bins=256, min_depth=0.001,
        max_depth=10.0, pos_strategy="learned_bbox_wh",
        dims_train=(416, 544), dims_test=(480, 640), dtype=jnp.bfloat16,
        attn_impl=attn_impl,
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((batch, n_obj, 512)).astype(np.float32))
    xywh = jnp.asarray(rng.uniform(0, 600, (batch, n_obj, 4)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(batch, n_obj)) < 0.5)

    init_model = GraphBins(**{**kw, "attn_impl": "xla"})
    variables = jax.jit(init_model.init)(jax.random.PRNGKey(0), img, feats, xywh, valid)
    folded = fold_batchnorm(variables)
    model = GraphBins(**kw, fold_bn=True)
    fwd = jax.jit(lambda p, *a: model.apply(p, *a))

    out = fwd(folded, img, feats, xywh, valid)
    float(jnp.sum(out["depth_pred"]))  # forced completion (axon tunnel)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(30):
            out = fwd(folded, img, feats, xywh, valid)
        float(jnp.sum(out["depth_pred"]))
        best = min(best, (time.perf_counter() - t0) / 30)
    return batch / best, np.asarray(out["depth_pred"], np.float32)


def main():
    _cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    r_xla, p_xla = measure("xla", batch)
    r_pal, p_pal = measure("pallas", batch)
    diff = float(np.max(np.abs(p_xla - p_pal)))
    print(f"xla:    {r_xla:8.1f} img/s")
    print(f"pallas: {r_pal:8.1f} img/s  ({r_pal / r_xla:.3f}x)")
    print(f"max |pred diff|: {diff:.2e}")


if __name__ == "__main__":
    main()
