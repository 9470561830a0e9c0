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


def test_prediction_artifacts_golden_format(tmp_path):
    """Pin predict-mode artifact formats against the reference writer
    (GraphBinsLM.py:285-428 + on_predict_end): prediction_metrics.csv has
    pandas to_csv(orient='index') shape — a leading unnamed index column,
    then batch_idx, filenames, the 8 pixel metrics, the 8 _ra metrics, and
    loss, in exactly the reference's insertion order — and the per-image
    files follow the {batch_idx}_{kind} naming scheme (VERDICT r4 #8)."""
    import csv
    import os

    from objcavit_tpu.config import Config
    from objcavit_tpu.training.loop import Trainer
    from tests.test_train_loop import _make_args

    args = _make_args(tmp_path)
    args.predict_output_dir = str(tmp_path / "predict_out")
    rows = Trainer(args).predict()
    assert rows, "predict produced no rows"

    csv_path = os.path.join(str(tmp_path / "predict_out"),
                            "prediction_metrics.csv")
    with open(csv_path, newline="") as f:
        got_rows = list(csv.reader(f))
    # exact reference column sequence (GraphBinsLM.py:374-400 insertion
    # order; pandas on_predict_end writes the dict keys + an unnamed index)
    want_header = (
        ["", "batch_idx", "image_filename", "depth_gt_filename"]
        + ["abs_rel", "sq_rel", "rmse", "rmse_log", "log10",
           "acc_1", "acc_2", "acc_3"]
        + ["abs_rel_ra", "sq_rel_ra", "rmse_ra", "rmse_log_ra", "log10_ra",
           "acc_1_ra", "acc_2_ra", "acc_3_ra"]
        + ["loss"]
    )
    assert got_rows[0] == want_header
    # index column counts 0..N-1 and batch_idx matches it (bs=1 protocol)
    for i, row in enumerate(got_rows[1:]):
        assert row[0] == str(i) and row[1] == str(i)
        assert len(row) == len(want_header)
        for v in row[4:]:
            float(v)  # every metric cell parses as a number

    # per-image artifact naming (reference predict_step:343-372; raw tensors
    # are .npy here instead of torch-pickle .pkl — documented divergence)
    out = str(tmp_path / "predict_out")
    for kind in ("im.png", "depth_gt.png", "depth_pred.png",
                 "depth_gt_raw.npy", "depth_pred_raw.npy"):
        assert os.path.exists(os.path.join(out, f"0_{kind}")), kind
