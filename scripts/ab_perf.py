#!/usr/bin/env python
"""A/B perf experiments on the flagship forward (real chip). Not driver-facing.

Variants (each an upper-bound probe via monkeypatch, not a correctness path):
  base     — current code
  nobn     — BatchNorm removed entirely (upper bound for BN folding gains)
  bf16rs   — resize_bilinear without the fp32 upcast inside bf16 models
  pallas   — attn_impl="pallas" in ObjCAViT
"""

import argparse
import time

import numpy as np


def build_and_time(variant: str, batch: int = 8, stage: str = "full"):
    import jax
    import jax.numpy as jnp

    import objcavit_tpu.models.common as common
    import objcavit_tpu.ops.resize as resize_mod

    if variant == "nobn":
        class _IdBN(common.nn.Module):
            epsilon: float = 1e-5
            momentum: float = 0.1
            dtype: object = jnp.float32

            @common.nn.compact
            def __call__(self, x, use_running_average=True):
                return x

        common.BatchNorm.__call__ = _IdBN.__call__

    if variant == "bf16rs":
        orig = resize_mod.resize_bilinear

        def fast_resize(x, out_h, out_w, align_corners=True, precision=None):
            import jax as _jax
            import jax.numpy as _jnp
            n, h, w, c = x.shape
            if (h, w) == (out_h, out_w):
                return x
            prec = precision or _jax.lax.Precision.HIGHEST
            xf = x
            if h != out_h:
                mh = _jnp.asarray(resize_mod._interp_matrix(h, out_h, align_corners), x.dtype)
                xf = _jnp.einsum("oh,nhk->nok", mh, xf.reshape(n, h, w * c),
                                 precision=prec).reshape(n, out_h, w, c)
            if w != out_w:
                mw = _jnp.asarray(resize_mod._interp_matrix(w, out_w, align_corners), x.dtype)
                xf = _jnp.einsum("ow,nhwc->nhoc", mw, xf, precision=prec)
            return xf

        # patch the symbol imported inside decoder.py
        import objcavit_tpu.models.decoder as dec
        dec.resize_bilinear = fast_resize

    from objcavit_tpu.models import GraphBins
    from objcavit_tpu.models.decoder import DenseFeatureExtractor

    h, w, n_obj = 480, 640, 300  # round-4 capacity parity
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((batch, n_obj, 512)).astype(np.float32))
    xywh = jnp.asarray(rng.uniform(0, 600, (batch, n_obj, 4)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(batch, n_obj)) < 0.5)

    if stage == "dense":
        m = DenseFeatureExtractor("efficientnet-b5", dtype=jnp.bfloat16)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), img)
        f = jax.jit(lambda p, x: m.apply(p, x))
        a = (p, img)
        get = lambda o: o
    else:
        m = GraphBins(
            encoder_name="efficientnet-b5", n_bins=256, min_depth=0.001,
            max_depth=10.0, pos_strategy="learned_bbox_wh",
            dims_train=(416, 544), dims_test=(480, 640), dtype=jnp.bfloat16,
            attn_impl="pallas" if variant == "pallas" else "xla",
        )
        p = jax.jit(m.init)(jax.random.PRNGKey(0), img, feats, xywh, valid)
        f = jax.jit(lambda p, *z: m.apply(p, *z))
        a = (p, img, feats, xywh, valid)
        get = lambda o: o["depth_pred"]

    out = f(*a)
    float(jnp.sum(get(out)))
    n_iter = 30
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f(*a)
    float(jnp.sum(get(out)))
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{variant:8s} stage={stage} batch={batch}: {dt*1e3:.1f}ms  "
          f"{batch/dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("variant")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--stage", default="full")
    args = ap.parse_args()
    build_and_time(args.variant, args.batch, args.stage)
