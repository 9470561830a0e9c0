"""BN-folding parity: fold_bn=True model on folded params == unfolded eval.

Folding rewrites each conv/BN pair into a biased conv (utils/fold_bn.py); at
inference the math is identical, so outputs must agree to fp32 tolerance even
with non-trivial running stats and BN affines.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objcavit_tpu.models import GraphBins
from objcavit_tpu.models.decoder import DenseFeatureExtractor
from objcavit_tpu.utils.fold_bn import fold_batchnorm

RNG = np.random.default_rng(11)
H, W = 64, 96


def _randomize_bn(variables, rng):
    """Give every BN non-trivial stats/affine so folding is actually exercised."""

    def visit(params, stats):
        for k in list(params.keys()):
            if not hasattr(params[k], "keys"):
                continue
            sub = params[k]
            if "scale" in sub and "bias" in sub and k in stats:
                n = sub["scale"].shape[0]
                sub["scale"] = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
                sub["bias"] = jnp.asarray(rng.normal(0, 0.2, n), jnp.float32)
                stats[k]["mean"] = jnp.asarray(rng.normal(0, 0.3, n), jnp.float32)
                stats[k]["var"] = jnp.asarray(rng.uniform(0.3, 2.0, n), jnp.float32)
            else:
                visit(sub, stats.get(k, {}) if hasattr(stats.get(k, {}), "keys") else {})

    visit(variables["params"], variables.get("batch_stats", {}))
    return variables


@pytest.mark.parametrize(
    "encoder_name",
    [
        "efficientnet-tiny",
        # v2 topology: fused blocks + the head ConvBnAct (BN+SiLU kept for
        # torchvision v2 encoders) must fold too
        "efficientnet-v2-tiny",
    ],
)
def test_fold_bn_matches_unfolded_dense(encoder_name):
    img = jnp.asarray(RNG.standard_normal((2, H, W, 3)).astype(np.float32))
    model = DenseFeatureExtractor(encoder_name)
    variables = model.init(jax.random.PRNGKey(0), img)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables = _randomize_bn(variables, RNG)

    ref = model.apply(variables, img)

    folded_model = DenseFeatureExtractor(encoder_name, fold_bn=True)
    folded = fold_batchnorm(variables)
    # the folded model consumes every folded param (no silently-ignored BNs)
    out = folded_model.apply(folded, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_fold_bn_matches_unfolded_graphbins():
    b, n = 1, 3
    img = jnp.asarray(RNG.standard_normal((b, H, W, 3)).astype(np.float32))
    feats = jnp.asarray(RNG.standard_normal((b, n, 512)).astype(np.float32))
    xywh = jnp.asarray(RNG.uniform(0, 60, (b, n, 4)).astype(np.float32))
    valid = jnp.ones((b, n), bool)

    kw = dict(encoder_name="efficientnet-tiny", n_bins=16, min_depth=0.001,
              max_depth=10.0, pos_strategy="learned_bbox_wh",
              dims_train=(H, W), dims_test=(H, W))
    model = GraphBins(**kw)
    variables = model.init(jax.random.PRNGKey(0), img, feats, xywh, valid)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables = _randomize_bn(variables, RNG)

    ref = model.apply(variables, img, feats, xywh, valid)["depth_pred"]
    folded = fold_batchnorm(variables)
    out = GraphBins(**kw, fold_bn=True).apply(folded, img, feats, xywh, valid)[
        "depth_pred"
    ]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_fold_yolov7_detector_matches_unfolded():
    """Detector BN folding + RepConv deploy-mode merge (3x3+1x1[+id] -> one
    biased 3x3) is numerically exact at inference."""
    from objcavit_tpu.models.yolov7 import RepConv, Yolov7Seg

    rng = np.random.default_rng(0)

    # RepConv WITH identity branch (in_ch == out_ch) — the hardest case
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    rep = RepConv(16)
    variables = rep.init(jax.random.PRNGKey(0), x)
    # randomise batch stats so folding is non-trivial
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape), a.dtype)
        if a.ndim == 1 else a,
        variables,
    )
    ref = rep.apply(variables, x)
    folded = fold_batchnorm(variables)
    out = RepConv(16, fold_bn=True).apply(folded, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)

    # full tiny-input detector end-to-end
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    det = Yolov7Seg(num_classes=3, nm=4)
    variables = jax.jit(det.init)(jax.random.PRNGKey(1), img)
    preds_ref, proto_ref = jax.jit(lambda v, i: det.apply(v, i))(variables, img)
    folded = fold_batchnorm(variables)
    fdet = Yolov7Seg(num_classes=3, nm=4, fold_bn=True)
    preds, proto = jax.jit(lambda v, i: fdet.apply(v, i))(folded, img)
    np.testing.assert_allclose(np.asarray(proto), np.asarray(proto_ref),
                               atol=2e-4, rtol=2e-4)
    for p, pr in zip(preds, preds_ref):
        np.testing.assert_allclose(np.asarray(p), np.asarray(pr), atol=2e-4,
                                   rtol=2e-4)
