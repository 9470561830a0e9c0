"""Eval-protocol tests: batched flip-TTA == the reference's two-pass scheme."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from objcavit_tpu.losses import LossWrapper
from objcavit_tpu.metrics import MetricsPreprocessConfig, metrics_init
from objcavit_tpu.models import GraphBins
from objcavit_tpu.training.steps import make_eval_step


pytestmark = pytest.mark.slow  # full-model jit compile

RNG = np.random.default_rng(29)
H, W, N = 64, 96, 3


def _setup():
    model = GraphBins(
        encoder_name="efficientnet-tiny", n_bins=16, min_depth=0.001,
        max_depth=10.0, pos_strategy="learned_bbox_wh",
        dims_train=(H, W), dims_test=(H, W),
    )
    img = jnp.asarray(RNG.uniform(0, 1, (2, H, W, 3)).astype(np.float32))
    depth = jnp.asarray(RNG.uniform(0.01, 9.5, (2, H, W, 1)).astype(np.float32))
    objects = {
        "features": jnp.zeros((2, N, 512), jnp.float32),
        "xywh": jnp.asarray(RNG.uniform(0, 60, (2, N, 4)).astype(np.float32)),
        "valid": jnp.ones((2, N), bool),
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), img, objects["features"], objects["xywh"],
        objects["valid"],
    )
    return model, variables, img, depth, objects


def test_batched_flip_tta_equals_two_sequential_passes():
    model, variables, img, depth, objects = _setup()
    mirrored = dict(objects)
    mirrored["xywh"] = objects["xywh"].at[..., 0].set(W - objects["xywh"][..., 0])

    # reference scheme (GraphBinsLM.py:154-183): forward, mirrored forward,
    # un-flip, clamp both, average
    def fwd(image, objs):
        return model.apply(
            variables, image, objs["features"], objs["xywh"], objs["valid"],
            train=False,
        )["depth_pred"]

    pred = jnp.clip(fwd(img, objects), 0.001, 10.0)
    pred_m = fwd(img[:, :, ::-1, :], mirrored)[:, :, ::-1, :]
    pred_m = jnp.clip(pred_m, 0.001, 10.0)
    want = 0.5 * (pred + pred_m)

    # framework scheme: one 2B batched forward inside the eval step
    eval_step = make_eval_step(
        model, LossWrapper(["silog"], [1.0]),
        MetricsPreprocessConfig(min_depth=0.001, max_depth=10.0),
        is_graphbins=True, flip_tta=True,
    )
    batch = {"image": img, "depth": depth,
             "sample_valid": jnp.ones((2,), bool)}
    _, _, got = eval_step(
        variables["params"], variables["batch_stats"], batch, objects,
        mirrored, metrics_init(),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)
