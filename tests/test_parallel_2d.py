"""2-D mesh (data x model): Megatron-TP attention params + spatial serving.

The reference's only scaling axis is DDP replication (main.py:66,104,129).
These tests validate the TPU-native extensions on the 8-device virtual CPU
mesh: tensor-parallel sharding of the attention-stack weights
(`parallel/tp.py`) and spatially-partitioned serving
(`serving.DepthPipeline(spatial=True)`), both pure-placement changes whose
numerics must match the replicated single-stream program.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from objcavit_tpu.models import GraphBins
from objcavit_tpu.parallel import (
    count_tp_sharded,
    make_mesh,
    shard_batch,
    tp_shard_params,
    tp_spec_for,
)
from objcavit_tpu.parallel.mesh import MODEL_AXIS

H, W, NOBJ = 64, 96, 3


def _tiny_model():
    return GraphBins(
        encoder_name="efficientnet-tiny", n_bins=16, min_depth=0.001,
        max_depth=10.0, pos_strategy="learned_bbox_wh",
        dims_train=(H, W), dims_test=(H, W),
    )


def _inputs(b):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (b, H, W, 3)).astype(np.float32)
    feats = rng.standard_normal((b, NOBJ, 512)).astype(np.float32)
    xywh = rng.uniform(0, 60, (b, NOBJ, 4)).astype(np.float32)
    valid = np.ones((b, NOBJ), bool)
    return img, feats, xywh, valid


@pytest.fixture(scope="module")
def tiny():
    model = _tiny_model()
    img, feats, xywh, valid = _inputs(4)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), img, feats, xywh, valid
    )
    return model, variables


def test_tp_specs_cover_attention_stacks(tiny):
    _, variables = tiny
    n = count_tp_sharded(variables["params"], 2)
    # every TransformerEncoderLayer contributes >=5 sharded leaves
    # (in_proj kernel+bias, out kernel, linear1 kernel+bias, linear2 kernel)
    assert n >= 20

    hits = {}

    def visit(path, x):
        names = [str(getattr(p, "key", "")) for p in path]
        spec = tp_spec_for(path, x, 2)
        if names[-1] == "in_proj_kernel":
            hits["in_proj"] = spec
        if names[-1] == "out_kernel":
            hits["out"] = spec
        if len(names) >= 2 and names[-2] == "linear1" and names[-1] == "kernel":
            hits["fc1"] = spec
        return x

    jax.tree_util.tree_map_with_path(visit, variables["params"])
    assert hits["in_proj"] == P(None, MODEL_AXIS)  # column
    assert hits["out"] == P(MODEL_AXIS, None)  # row
    assert hits["fc1"] == P(None, MODEL_AXIS)

    # odd tp degree that doesn't divide the packed 3E columns -> replicated
    def check_odd(path, x):
        spec = tp_spec_for(path, x, 7)
        names = [str(getattr(p, "key", "")) for p in path]
        if names and names[-1] == "in_proj_kernel" and x.shape[1] % 7:
            assert spec == P()
        return x

    jax.tree_util.tree_map_with_path(check_odd, variables["params"])


def test_tp_forward_matches_replicated(tiny):
    model, variables = tiny
    img, feats, xywh, valid = _inputs(4)

    ref = jax.jit(lambda v: model.apply(v, img, feats, xywh, valid,
                                        train=False))(variables)

    mesh = make_mesh(n_data=4, n_model=2)
    tp_params = tp_shard_params(mesh, variables["params"])
    assert count_tp_sharded(variables["params"], 2) >= 20
    tp_vars = {"params": tp_params, **{
        k: v for k, v in variables.items() if k != "params"
    }}
    batch = shard_batch(mesh, (img, feats, xywh, valid))
    out = jax.jit(
        lambda v, i, f, x, m: model.apply(v, i, f, x, m, train=False)
    )(tp_vars, *batch)

    np.testing.assert_allclose(
        np.asarray(out["depth_pred"], np.float32),
        np.asarray(ref["depth_pred"], np.float32),
        rtol=2e-4, atol=2e-5,
    )


def test_tp_train_step_runs_and_keeps_sharding(tiny):
    from objcavit_tpu.losses import LossWrapper
    from objcavit_tpu.training.optim import build_optimizer
    from objcavit_tpu.training.state import TrainState
    from objcavit_tpu.training.steps import make_train_step

    model, variables = tiny
    mesh = make_mesh(n_data=4, n_model=2)
    # copy first: device_put aliases the source buffer for the shard living
    # on the source device, so donating the sharded state below would also
    # delete the module-scoped fixture's originals (see tp_shard_params doc)
    tp_params = tp_shard_params(
        mesh, jax.tree.map(jnp.array, variables["params"])
    )
    tx = build_optimizer(
        lr=3.57e-4, weight_decay=0.1, total_steps=10, gradient_clip_val=0.1
    )
    # copy batch_stats: the jitted step donates `state`, and donating the
    # module-scoped fixture's buffers would delete them for later tests
    bstats = jax.tree.map(jnp.array, variables.get("batch_stats", {}))
    state = TrainState.create(tp_params, bstats, tx)

    img, feats, xywh, valid = _inputs(8)
    rng = np.random.default_rng(1)
    batch = shard_batch(mesh, {
        "image": img,
        "depth": rng.uniform(0.01, 9.0, (8, H, W, 1)).astype(np.float32),
    })
    objects = shard_batch(mesh, {
        "features": feats, "xywh": xywh, "valid": valid,
    })

    step = jax.jit(
        make_train_step(model, tx, LossWrapper(["silog", "bins_chamfer"],
                                               [1, 0.1]),
                        min_depth=0.001, augment_on_device=True,
                        is_graphbins=True),
        donate_argnums=(0,),
    )
    state, loss = step(state, batch, objects, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert int(state.step) == 1

    # the updated params must still be model-axis sharded (no silent gather)
    def assert_still_sharded(path, x):
        spec = tp_spec_for(path, x, 2)
        if spec != P():
            def _norm(s):
                t = tuple(s)
                while t and t[-1] is None:
                    t = t[:-1]
                return t

            got = x.sharding.spec
            assert _norm(got) == _norm(spec), (path, got, spec)
        return x

    jax.tree_util.tree_map_with_path(assert_still_sharded, state.params)


def test_spatial_bs1_eval_matches_replicated(tiny):
    """The reference's -v protocol is bs=1 (main.py:58). Pure data-parallel
    serving leaves 7 of 8 chips idle there; the spatial path shards the image
    HEIGHT over the model axis instead, so one image spans the mesh. Output
    must match the single-device result (VERDICT r3 next-round #7)."""
    from objcavit_tpu.serving import DepthPipeline

    model, variables = tiny
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (1, H, W, 3)).astype(np.uint8)

    base = DepthPipeline(model, variables, eval_dims=(H, W),
                         n_obj_max=NOBJ, use_mesh=False)
    ref = np.asarray(base(frames), np.float32)

    mesh = make_mesh(n_data=1, n_model=8)  # all 8 devices on ONE image
    sp = DepthPipeline(model, variables, eval_dims=(H, W), n_obj_max=NOBJ,
                       mesh=mesh, spatial=True)
    out = sp(frames)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref, rtol=2e-4, atol=2e-5
    )


def test_spatial_serving_matches_replicated(tiny):
    from objcavit_tpu.serving import DepthPipeline

    model, variables = tiny
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (8, H, W, 3)).astype(np.uint8)

    base = DepthPipeline(model, variables, eval_dims=(H, W),
                         n_obj_max=NOBJ, use_mesh=False)
    ref = np.asarray(base(frames), np.float32)

    mesh = make_mesh(n_data=4, n_model=2)
    sp = DepthPipeline(model, variables, eval_dims=(H, W), n_obj_max=NOBJ,
                       mesh=mesh, spatial=True)
    out = sp(frames)
    assert len(out.sharding.device_set) == 8  # spans the full 2-D mesh
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref, rtol=2e-4, atol=2e-5
    )
