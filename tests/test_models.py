"""Shape/sanity tests for the model stack (tiny inputs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from objcavit_tpu.models import AdaBins, GraphBins
from objcavit_tpu.models.efficientnet import ENCODER_SPECS, EfficientNetEncoder


pytestmark = pytest.mark.slow  # full-model jit compile

RNG = np.random.default_rng(3)

# H, W divisible by 32 (stride pyramid) and by 2*16 (ObjCAViT patches)
H, W = 64, 96
B = 1


def _image():
    return jnp.asarray(RNG.standard_normal((B, H, W, 3)).astype(np.float32))


@pytest.mark.parametrize("name", ["efficientnet-b1", "efficientnet-v2-s"])
def test_encoder_feature_pyramid_shapes(name):
    enc = EfficientNetEncoder(name)
    feats = enc.init_with_output(jax.random.PRNGKey(0), _image())[0]
    spec = ENCODER_SPECS[name]
    assert len(feats) == 5
    for i, (f, ch) in enumerate(zip(feats, spec.skip_channels)):
        stride = 2 ** (i + 1)
        assert f.shape == (B, H // stride, W // stride, ch), (i, f.shape)


def test_adabins_forward_shapes():
    model = AdaBins(encoder_name="efficientnet-b1", n_bins=32,
                    min_depth=0.001, max_depth=10.0)
    out, _ = model.init_with_output(jax.random.PRNGKey(0), _image())
    depth, edges = out["depth_pred"], out["bin_edges"]
    assert depth.shape == (B, H // 2, W // 2, 1)
    assert edges.shape == (B, 33)
    d = np.asarray(depth)
    # depth is an expectation over bin centres inside [min, ~max+min]
    assert (d > 0).all() and (d <= 10.1).all()
    # edges start at min_depth and are monotonically increasing
    e = np.asarray(edges)
    np.testing.assert_allclose(e[:, 0], 0.001, rtol=1e-5)
    assert (np.diff(e, axis=1) > 0).all()


@pytest.mark.parametrize(
    "pos_strategy",
    ["learned", "learned_bbox_wh", "grid_random", "grid_random_roi_align"],
)
def test_graphbins_forward_all_pos_strategies(pos_strategy):
    n_max = 3  # must be <= image seq len (here (H/2/16)*(W/2/16) = 2*3 = 6)
    model = GraphBins(
        encoder_name="efficientnet-b1", n_bins=16, min_depth=0.001,
        max_depth=10.0, pos_strategy=pos_strategy,
        dims_train=(H, W), dims_test=(H, W),
    )
    feats = jnp.asarray(RNG.standard_normal((B, n_max, 512)).astype(np.float32))
    xywh = jnp.asarray(
        np.array([[[20.0, 30.0, 10.0, 12.0], [50.0, 40.0, 30.0, 20.0],
                   [-1.0, -1.0, -1.0, -1.0]]], dtype=np.float32)
    )
    valid = jnp.asarray(np.array([[True, True, False]]))
    out, _ = model.init_with_output(
        jax.random.PRNGKey(0), _image(), feats, xywh, valid
    )
    assert out["depth_pred"].shape == (B, H // 2, W // 2, 1)
    assert out["bin_edges"].shape == (B, 17)
    assert np.isfinite(np.asarray(out["depth_pred"])).all()


def test_graphbins_invalid_objects_do_not_leak():
    """Changing features/xywh of an invalid slot must not change the output."""
    model = GraphBins(
        encoder_name="efficientnet-b1", n_bins=16, min_depth=0.001,
        max_depth=10.0, pos_strategy="learned_bbox_wh",
        dims_train=(H, W), dims_test=(H, W),
    )
    img = _image()
    feats = jnp.asarray(RNG.standard_normal((B, 3, 512)).astype(np.float32))
    xywh = jnp.asarray(RNG.uniform(0, 50, (B, 3, 4)).astype(np.float32))
    valid = jnp.asarray(np.array([[True, True, False]]))
    params = model.init(jax.random.PRNGKey(0), img, feats, xywh, valid)
    out1 = model.apply(params, img, feats, xywh, valid)
    feats2 = feats.at[:, 2].set(99.0)
    xywh2 = xywh.at[:, 2].set(123.0)
    out2 = model.apply(params, img, feats2, xywh2, valid)
    np.testing.assert_array_equal(
        np.asarray(out1["depth_pred"]), np.asarray(out2["depth_pred"])
    )


def test_graphbins_use_2_saca_and_no_obj_sa():
    model = GraphBins(
        encoder_name="efficientnet-b1", n_bins=16, min_depth=0.001,
        max_depth=10.0, pos_strategy="learned", no_obj_sa=True, use_2_saca=True,
        dims_train=(H, W), dims_test=(H, W),
    )
    feats = jnp.zeros((B, 2, 512), jnp.float32)  # zeros-control language
    xywh = jnp.asarray(RNG.uniform(0, 50, (B, 2, 4)).astype(np.float32))
    valid = jnp.ones((B, 2), bool)
    out, _ = model.init_with_output(
        jax.random.PRNGKey(0), _image(), feats, xywh, valid
    )
    assert np.isfinite(np.asarray(out["depth_pred"])).all()
