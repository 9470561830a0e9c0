"""Serving pipeline: fused uint8 -> depth program (tiny model, CPU mesh)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from objcavit_tpu.models import GraphBins
from objcavit_tpu.serving import DepthPipeline


pytestmark = pytest.mark.slow  # full-model jit compile

RNG = np.random.default_rng(19)


def _tiny_pipeline(output_at_input_res=False):
    dims = (64, 96)
    model = GraphBins(
        encoder_name="efficientnet-tiny", n_bins=16, min_depth=0.001,
        max_depth=10.0, pos_strategy="learned_bbox_wh",
        dims_train=dims, dims_test=dims,
    )
    img = jnp.zeros((1, *dims, 3), jnp.float32)
    feats = jnp.zeros((1, 4, 512), jnp.float32)
    xywh = jnp.full((1, 4, 4), -1.0, jnp.float32)
    valid = jnp.zeros((1, 4), bool).at[:, 0].set(True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, feats, xywh, valid)
    return DepthPipeline(
        model, variables, eval_dims=dims, n_obj_max=4,
        output_at_input_res=output_at_input_res,
    )


def test_pipeline_uint8_to_depth_and_batch_sharding():
    pipe = _tiny_pipeline()
    # camera-resolution frames: batch divisible by the 8-device mesh
    frames = RNG.integers(0, 255, (8, 120, 160, 3), dtype=np.uint8)
    depth = np.asarray(pipe(frames))
    assert depth.shape == (8, 32, 48, 1)
    assert np.isfinite(depth).all()
    assert (depth > 0).all() and (depth <= 10.2).all()


def test_pipeline_output_at_input_res():
    pipe = _tiny_pipeline(output_at_input_res=True)
    frames = RNG.integers(0, 255, (8, 120, 160, 3), dtype=np.uint8)
    depth = np.asarray(pipe(frames))
    assert depth.shape == (8, 120, 160, 1)


def test_stream_depth_batches_and_trims():
    from objcavit_tpu.serving import stream_depth

    pipe = _tiny_pipeline()
    frames = [
        RNG.integers(0, 255, (120, 160, 3), dtype=np.uint8) for _ in range(19)
    ]
    out_frames, out_depths = [], []
    for f, d in stream_depth(pipe, iter(frames), batch_size=8):
        out_frames.append(f)
        out_depths.append(d)
    assert [f.shape[0] for f in out_frames] == [8, 8, 3]  # final batch trimmed
    total = np.concatenate(out_depths)
    assert total.shape == (19, 32, 48, 1)
    assert np.isfinite(total).all()
