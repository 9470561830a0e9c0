"""Sharded == single-device numerical equivalence (VERDICT r4 next #2).

The data-parallel story's correctness proof must be an allclose, not
isfinite: a wrong-mean gradient reduction or a batch-reassembly bug keeps
losses finite while silently training a different model. These tests pin,
on the 8-device CPU mesh (conftest):

  * the train step's loss AND per-leaf gradients — the sharded execution of
    make_train_loss_fn (the exact closure make_train_step differentiates)
    reproduces the single-device execution on the same global batch. This
    matches the reference's effective semantics: one global batch, one
    loss, one gradient (Lightning DDP averages per-replica grads of
    per-replica losses, /root/reference/main.py:66 — equal to the global
    gradient for mean-style losses; our step IS the global-batch gradient
    by construction, see docs/MIGRATION.md "DDP recipe mapping");
  * one data-sharded DepthPipeline serving batch vs use_mesh=False;
  * one full sharded train_step's updated params vs the single-device step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from objcavit_tpu.losses import LossWrapper
from objcavit_tpu.models import GraphBins
from objcavit_tpu.parallel import make_mesh, shard_batch
from objcavit_tpu.training.optim import build_optimizer
from objcavit_tpu.training.state import TrainState
from objcavit_tpu.training.steps import make_train_loss_fn, make_train_step

pytestmark = pytest.mark.slow  # full-model jit compiles (two shardings)

H, W, NOBJ = 64, 96, 3


def _setup(b):
    rng = np.random.default_rng(0)
    model = GraphBins(
        encoder_name="efficientnet-tiny", n_bins=16, min_depth=0.001,
        max_depth=10.0, pos_strategy="learned_bbox_wh",
        dims_train=(H, W), dims_test=(H, W),
    )
    batch = {
        "image": rng.uniform(0, 1, (b, H, W, 3)).astype(np.float32),
        "depth": rng.uniform(0.01, 9.0, (b, H, W, 1)).astype(np.float32),
    }
    objects = {
        "features": rng.standard_normal((b, NOBJ, 512)).astype(np.float32) * 0.02,
        "xywh": rng.uniform(0, 60, (b, NOBJ, 4)).astype(np.float32),
        "valid": np.ones((b, NOBJ), bool),
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(batch["image"]),
        jnp.asarray(objects["features"]), jnp.asarray(objects["xywh"]),
        jnp.asarray(objects["valid"]),
    )
    return model, variables, batch, objects


def _tree_allclose(got, want, rtol, atol, tag):
    fg = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    fw = dict(jax.tree_util.tree_flatten_with_path(want)[0])
    assert set(fg) == set(fw)
    for path in sorted(fg, key=str):
        g = np.asarray(fg[path], np.float64)
        w = np.asarray(fw[path], np.float64)
        err = np.linalg.norm(g - w)
        ref = np.linalg.norm(w)
        assert err <= rtol * ref + atol, (
            f"{tag} {jax.tree_util.keystr(path)}: ||diff||={err:.3e} vs "
            f"||ref||={ref:.3e}"
        )


def test_sharded_train_grads_equal_single_device():
    n = jax.device_count()
    assert n >= 8, "conftest provides the 8-device CPU mesh"
    mesh = make_mesh(n_data=n)
    model, variables, batch, objects = _setup(b=n)

    loss_fn = make_train_loss_fn(
        model, LossWrapper(["silog", "bins_chamfer"], [1, 0.1]),
        min_depth=0.001, augment_on_device=True, is_graphbins=True,
    )
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    rng = jax.random.PRNGKey(1)

    # single device: plain (uncommitted, device-0) arrays
    (loss_1, _), grads_1 = grad_fn(
        variables["params"], variables["batch_stats"],
        jax.tree.map(jnp.asarray, batch), jax.tree.map(jnp.asarray, objects),
        rng,
    )
    # sharded: same global batch split over the data axis
    (loss_n, _), grads_n = grad_fn(
        variables["params"], variables["batch_stats"],
        shard_batch(mesh, batch), shard_batch(mesh, objects), rng,
    )

    np.testing.assert_allclose(
        float(loss_n), float(loss_1), rtol=1e-5, err_msg="global-batch loss"
    )
    _tree_allclose(grads_n, grads_1, rtol=1e-3, atol=1e-7, tag="grad")

    # global direction agreement (catches a uniform wrong-mean scale that
    # per-leaf norm ratios would also catch, but cheaply readable)
    dot = got_sq = want_sq = 0.0
    for path, g in jax.tree_util.tree_flatten_with_path(grads_n)[0]:
        w = np.asarray(
            dict(jax.tree_util.tree_flatten_with_path(grads_1)[0])[path],
            np.float64,
        ).ravel()
        gv = np.asarray(g, np.float64).ravel()
        dot += float(gv @ w)
        got_sq += float(gv @ gv)
        want_sq += float(w @ w)
    assert abs(np.sqrt(got_sq / want_sq) - 1) < 1e-5
    assert dot / np.sqrt(got_sq * want_sq) > 1 - 1e-9


def test_sharded_full_step_params_equal_single_device():
    n = jax.device_count()
    mesh = make_mesh(n_data=n)
    model, variables, batch, objects = _setup(b=n)
    params0 = jax.tree.map(np.asarray, variables["params"])
    stats0 = jax.tree.map(np.asarray, variables["batch_stats"])

    tx = build_optimizer(
        lr=3.57e-4, weight_decay=0.1, total_steps=10, gradient_clip_val=0.1
    )
    step = jax.jit(
        make_train_step(model, tx, LossWrapper(["silog", "bins_chamfer"], [1, 0.1]),
                        min_depth=0.001, augment_on_device=True,
                        is_graphbins=True)
    )
    rng = jax.random.PRNGKey(2)

    s1 = TrainState.create(
        jax.tree.map(jnp.asarray, params0), jax.tree.map(jnp.asarray, stats0), tx
    )
    s1, loss_1 = step(s1, jax.tree.map(jnp.asarray, batch),
                      jax.tree.map(jnp.asarray, objects), rng)

    sn = TrainState.create(
        jax.tree.map(jnp.asarray, params0), jax.tree.map(jnp.asarray, stats0), tx
    )
    sn, loss_n = step(sn, shard_batch(mesh, batch),
                      shard_batch(mesh, objects), rng)

    np.testing.assert_allclose(float(loss_n), float(loss_1), rtol=1e-5)

    # updated params: AdamW's first-step update is ~ -lr0 * g/(|g| + eps) —
    # for leaves whose gradient is MATHEMATICALLY zero (a conv bias feeding
    # straight into BatchNorm), g is reduction-order noise (~1e-9) and the
    # update's SIGN is noise-determined, so sharded and single-device runs
    # legitimately differ by O(lr0) there. Skip those leaves (the grads
    # test above is the real reduction-bug detector); every leaf with a
    # real gradient must agree at fp tolerance.
    loss_fn = make_train_loss_fn(
        model, LossWrapper(["silog", "bins_chamfer"], [1, 0.1]),
        min_depth=0.001, augment_on_device=True, is_graphbins=True,
    )
    _, g1 = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
        jax.tree.map(jnp.asarray, params0), jax.tree.map(jnp.asarray, stats0),
        jax.tree.map(jnp.asarray, batch), jax.tree.map(jnp.asarray, objects),
        rng,
    )
    flat_g = dict(jax.tree_util.tree_flatten_with_path(g1)[0])
    fp_n = dict(jax.tree_util.tree_flatten_with_path(sn.params)[0])
    fp_1 = dict(jax.tree_util.tree_flatten_with_path(s1.params)[0])
    assert set(fp_n) == set(fp_1)
    n_checked = n_noise = 0
    for path in sorted(fp_n, key=str):
        if np.linalg.norm(np.asarray(flat_g[path], np.float64)) < 1e-6:
            n_noise += 1  # zero-math-grad leaf: update sign is noise
            continue
        g = np.asarray(fp_n[path], np.float64)
        w = np.asarray(fp_1[path], np.float64)
        err = np.linalg.norm(g - w)
        ref = np.linalg.norm(w)
        assert err <= 1e-4 * ref + 3e-7, (
            f"updated param {jax.tree_util.keystr(path)}: "
            f"||diff||={err:.3e} vs ||ref||={ref:.3e}"
        )
        n_checked += 1
    assert n_checked > 100, (n_checked, n_noise)  # the comparison has teeth
    # atol floors out channels whose true batch mean is ~0 (reduction noise)
    _tree_allclose(sn.batch_stats, s1.batch_stats, rtol=1e-4, atol=1e-6,
                   tag="updated BN stat")


def test_data_sharded_serving_equals_unsharded():
    from objcavit_tpu.serving import DepthPipeline

    n = jax.device_count()
    mesh = make_mesh(n_data=n)
    model, variables, _batch, _objects = _setup(b=n)
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (2 * n, H, W, 3)).astype(np.uint8)

    sharded = DepthPipeline(
        model, variables, eval_dims=(H, W), n_obj_max=NOBJ, mesh=mesh,
    )
    plain = DepthPipeline(
        model, variables, eval_dims=(H, W), n_obj_max=NOBJ, use_mesh=False,
    )
    got = np.asarray(sharded(frames), np.float32)
    want = np.asarray(plain(frames), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
