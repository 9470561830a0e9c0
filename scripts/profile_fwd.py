#!/usr/bin/env python
"""Stage-level timing of the flagship GraphBins-B5 forward on the real chip.

Times encoder-only, encoder+decoder (dense features), and the full model at
several batch sizes, plus derived per-stage deltas. Used to aim perf work;
not part of the driver contract.
"""

import argparse
import time

import numpy as np


def timeit(fn, args, n_iter=20):
    import jax.numpy as jnp

    out = fn(*args)
    leaf = out if not isinstance(out, (dict, list, tuple)) else (
        out["depth_pred"] if isinstance(out, dict) else out[-1]
    )
    float(jnp.sum(leaf))  # warm + sync
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    leaf = out if not isinstance(out, (dict, list, tuple)) else (
        out["depth_pred"] if isinstance(out, dict) else out[-1]
    )
    float(jnp.sum(leaf))
    return (time.perf_counter() - t0) / n_iter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[8])
    p.add_argument("--stages", nargs="+", default=["enc", "dense", "full"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models import GraphBins
    from objcavit_tpu.models.decoder import DenseFeatureExtractor
    from objcavit_tpu.models.efficientnet import EfficientNetEncoder

    h, w, n_obj = 480, 640, 300  # round-4 capacity parity
    for batch in args.batches:
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((batch, n_obj, 512)).astype(np.float32))
        xywh = jnp.asarray(rng.uniform(0, 600, (batch, n_obj, 4)).astype(np.float32))
        valid = jnp.asarray(rng.uniform(size=(batch, n_obj)) < 0.5)

        results = {}
        if "enc" in args.stages:
            enc = EfficientNetEncoder("efficientnet-b5", dtype=jnp.bfloat16)
            p_enc = jax.jit(enc.init)(jax.random.PRNGKey(0), img)
            f_enc = jax.jit(lambda p, x: enc.apply(p, x)[-1])
            results["enc"] = timeit(f_enc, (p_enc, img))
        if "dense" in args.stages:
            dfe = DenseFeatureExtractor("efficientnet-b5", dtype=jnp.bfloat16)
            p_dfe = jax.jit(dfe.init)(jax.random.PRNGKey(0), img)
            f_dfe = jax.jit(lambda p, x: dfe.apply(p, x))
            results["dense"] = timeit(f_dfe, (p_dfe, img))
        if "full" in args.stages:
            model = GraphBins(
                encoder_name="efficientnet-b5", n_bins=256, min_depth=0.001,
                max_depth=10.0, pos_strategy="learned_bbox_wh",
                dims_train=(416, 544), dims_test=(480, 640), dtype=jnp.bfloat16,
            )
            p_full = jax.jit(model.init)(jax.random.PRNGKey(0), img, feats, xywh, valid)
            f_full = jax.jit(lambda p, *a: model.apply(p, *a))
            results["full"] = timeit(f_full, (p_full, img, feats, xywh, valid))

        line = [f"batch={batch}"]
        for k, v in results.items():
            line.append(f"{k}={v*1e3:.1f}ms ({batch/v:.1f} img/s)")
        if "dense" in results and "enc" in results:
            line.append(f"decoder_delta={(results['dense']-results['enc'])*1e3:.1f}ms")
        if "full" in results and "dense" in results:
            line.append(f"objcavit_delta={(results['full']-results['dense'])*1e3:.1f}ms")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
