#!/usr/bin/env python
"""bs=1 protocol-eval latency (VERDICT r3 next-round #7).

The reference's -v protocol mandates bs=1, single device, flip-TTA
(main.py:58,68; GraphBinsLM.py:154-222). This measures the actual per-image
wall time of OUR jitted eval step — the single 2B-batched flip-TTA forward
+ clamp + MetricsPreprocess + 16 metric updates — for the flagship
GraphBins-B5 at 480x640 on one v5e chip, at the round-4 capacity-parity
object count (300).

p50 is the synchronised per-dispatch latency a -v run observes per image;
best-of is the pipelined throughput bound. The multi-chip answer for this
batch-starved regime is the spatially-sharded serving path
(DepthPipeline(spatial=True)), A/B'd on the virtual mesh by
tests/test_parallel_2d.py::test_spatial_bs1_eval_matches_replicated and the
dryrun's bs=1 spatial==replicated assertion.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.losses import LossWrapper
    from objcavit_tpu.metrics import MetricsPreprocessConfig, metrics_init
    from objcavit_tpu.models import GraphBins
    from objcavit_tpu.training.steps import make_eval_step
    from objcavit_tpu.utils.benchkit import best_of, flagship_kwargs, p50_of

    rng = np.random.default_rng(0)
    h, w, n_obj = 480, 640, 300
    model = GraphBins(**flagship_kwargs())
    batch = {
        "image": jnp.asarray(
            rng.standard_normal((1, h, w, 3)).astype(np.float32)
        ),
        "depth": jnp.asarray(
            rng.uniform(0.01, 9.9, (1, h, w, 1)).astype(np.float32)
        ),
        "sample_valid": jnp.ones((1,), bool),
    }
    objects = {
        "features": jnp.asarray(
            (0.02 * rng.standard_normal((1, n_obj, 512))).astype(np.float32)
        ),
        "xywh": jnp.asarray(
            rng.uniform(0, 600, (1, n_obj, 4)).astype(np.float32)
        ),
        "valid": jnp.asarray(rng.uniform(size=(1, n_obj)) < 0.1)
        .at[:, 0].set(True),
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["image"], objects["features"],
        objects["xywh"], objects["valid"],
    )
    mp_cfg = MetricsPreprocessConfig(
        min_depth=0.001, max_depth=10.0, garg_crop=False, eigen_crop=True,
        dataset="nyu",
    )
    eval_step = jax.jit(
        make_eval_step(
            model, LossWrapper(["silog", "bins_chamfer"], [1, 0.1]), mp_cfg,
            is_graphbins=True, flip_tta=True,
        )
    )
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    holder = {}

    def run():
        holder["o"] = eval_step(
            params, batch_stats, batch, objects, objects, metrics_init()
        )
        return holder["o"]

    def sync(_=None):
        float(holder["o"][1])  # loss scalar readback

    p50 = p50_of(run, sync)
    thr = best_of(run, sync, n_iter=20)
    print(json.dumps({
        "eval_bs1_p50_ms_per_image": round(p50 * 1000, 1),
        "eval_bs1_pipelined_ms_per_image": round(thr * 1000, 1),
        "eval_bs1_img_per_s": round(1.0 / thr, 1),
        "note": "flip-TTA single 2B forward + metrics, B5 480x640, n_obj=300",
    }))


if __name__ == "__main__":
    main()
