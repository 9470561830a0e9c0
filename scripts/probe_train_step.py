#!/usr/bin/env python
"""Time ONLY the bs=8 416x544 flagship train step (bench.py's train extra).

Quick re-measure after train-path changes without paying bench.py's three
big serving compiles.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.losses.losses import LossWrapper
    from objcavit_tpu.models.graphbins import GraphBins
    from objcavit_tpu.training.optim import build_optimizer
    from objcavit_tpu.training.state import TrainState
    from objcavit_tpu.training.steps import make_train_step
    from objcavit_tpu.utils.benchkit import best_of

    rng = np.random.default_rng(0)
    tb, th, tw, n_obj = 8, 416, 544, 221  # round-4 capacity parity
    kw = dict(
        encoder_name="efficientnet-b5", n_bins=256, min_depth=0.001,
        max_depth=10.0, pos_strategy="learned", dims_train=(th, tw),
        dims_test=(480, 640), dtype=jnp.bfloat16,
    )
    tbatch = {
        "image": jnp.asarray(rng.standard_normal((tb, th, tw, 3)).astype(np.float32)),
        "depth": jnp.asarray(
            rng.uniform(0.1, 10.0, (tb, th, tw, 1)).astype(np.float32)
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

    dt = best_of(run_train, lambda _=None: float(holder["l"]), n_iter=10)
    print(json.dumps({"train_ms_per_step_bs8_416x544": round(dt * 1000, 1)}))


if __name__ == "__main__":
    main()
