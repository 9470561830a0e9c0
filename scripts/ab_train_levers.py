#!/usr/bin/env python
"""Training-efficiency lever round (VERDICT r3 next-round #6).

The serving path got a full measured-lever treatment in r2/r3; training had
none. This script measures, on the v5e chip at 416x544 with the round-4
capacity-parity object count (221):

  * batch-size scaling: bs 8 / 16 / 32 / 64 (the reference recipe is bs=8,
    basicParams.yaml:6 — that stays the parity default; this measures what a
    TPU-first deployment SHOULD use per chip),
  * remat (jax.checkpoint) policy A/B at the best batch: none vs
    dots_with_no_batch_dims_saveable vs full remat — rematerialisation
    trades FLOPs for HBM, which can unlock larger batches,
  * activation-dtype A/B at bs=8: bf16 compute (current default; params stay
    fp32 master copies held by AdamW) vs full fp32.

Prints one JSON line per measurement + a summary line. Results recorded in
docs/PERF.md; the overfit-convergence guard (tests/test_train_loop.py) is
the safety net that the step semantics stay correct.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TH, TW, N_OBJ = 416, 544, 221


def _make_step(model, remat: str | None):
    import jax

    from objcavit_tpu.data.augment import augment_batch
    from objcavit_tpu.losses import LossWrapper
    from objcavit_tpu.training.optim import build_optimizer

    import optax

    loss_wrapper = LossWrapper(["silog", "bins_chamfer"], [1, 0.1])
    tx = build_optimizer(3.57e-4, 0.1, total_steps=100, gradient_clip_val=0.1)

    def apply_fn(params, batch_stats, image, feats, xywh, valid, rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            image, feats, xywh, valid, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng, "droppath": jax.random.fold_in(rng, 1)},
        )
        return out, mutated["batch_stats"]

    if remat == "dots":
        apply_fn = jax.checkpoint(
            apply_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    elif remat == "full":
        apply_fn = jax.checkpoint(apply_fn)

    def train_step(state, batch, objects, rng):
        image, depth_gt = batch["image"], batch["depth"]
        aug_rng, rng = jax.random.split(rng)
        image, depth_gt = augment_batch(aug_rng, image, depth_gt)

        def loss_fn(params):
            out, new_bs = apply_fn(
                params, state.batch_stats, image, objects["features"],
                objects["xywh"], objects["valid"], rng,
            )
            mask = depth_gt > 0.001
            loss = loss_wrapper(out["depth_pred"], depth_gt, mask,
                                out["bin_edges"])
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt,
        ), loss

    return tx, train_step


def _measure(tb: int, remat: str | None = None, dtype_name: str = "bf16"):
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models import GraphBins
    from objcavit_tpu.training.state import TrainState
    from objcavit_tpu.utils.benchkit import best_of, flagship_kwargs

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    kw = {**flagship_kwargs(), "dtype": dtype}
    model = GraphBins(**kw)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.uniform(0, 1, (tb, TH, TW, 3)).astype(np.float32)
        ),
        "depth": jnp.asarray(
            rng.uniform(0.01, 9.0, (tb, TH, TW, 1)).astype(np.float32)
        ),
    }
    objs = {
        "features": jnp.asarray(
            (0.02 * rng.standard_normal((tb, N_OBJ, 512))).astype(np.float32)
        ),
        "xywh": jnp.asarray(
            rng.uniform(0, 400, (tb, N_OBJ, 4)).astype(np.float32)
        ),
        "valid": jnp.asarray(rng.uniform(size=(tb, N_OBJ)) < 0.3)
        .at[:, 0].set(True),
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(2), batch["image"][:1], objs["features"][:1],
        objs["xywh"][:1], objs["valid"][:1],
    )
    tx, train_step = _make_step(model, remat)
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}), tx
    )
    step = jax.jit(train_step, donate_argnums=(0,))
    holder = {"s": state}

    def run():
        holder["s"], holder["l"] = step(
            holder["s"], batch, objs, jax.random.PRNGKey(3)
        )
        return holder["l"]

    def sync(_=None):
        float(holder["l"])

    try:
        dt = best_of(run, sync, n_iter=max(4, 32 // tb))
    except Exception as e:  # OOM etc.
        return {"error": str(e)[:200]}
    return {"ms_per_step": round(dt * 1000, 1),
            "img_per_s": round(tb / dt, 1)}


def main():
    out = {}
    for tb in (8, 16, 32, 64):
        r = _measure(tb)
        out[f"bs{tb}"] = r
        print(json.dumps({f"bs{tb}": r}), flush=True)
    best_bs = max(
        (k for k in out if "img_per_s" in out[k]),
        key=lambda k: out[k]["img_per_s"],
    )
    tb_best = int(best_bs[2:])
    for remat in ("dots", "full"):
        r = _measure(tb_best, remat=remat)
        out[f"bs{tb_best}_remat_{remat}"] = r
        print(json.dumps({f"bs{tb_best}_remat_{remat}": r}), flush=True)
    r = _measure(8, dtype_name="fp32")
    out["bs8_fp32"] = r
    print(json.dumps({"bs8_fp32": r}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
