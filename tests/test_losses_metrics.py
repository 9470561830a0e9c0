"""Parity tests for losses and metrics against torch-math oracles."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from objcavit_tpu.losses import LossWrapper, silog_loss
from objcavit_tpu.metrics import (
    MetricsPreprocessConfig,
    metrics_compute,
    metrics_init,
    metrics_preprocess,
    metrics_update,
)

RNG = np.random.default_rng(1)


def _torch_silog(pred, gt, mask, alpha=10.0, lam=0.85):
    """Reference formula from losses/SILogLoss.py (with interpolation)."""
    pred = F.interpolate(pred, gt.shape[-2:], mode="bilinear", align_corners=True)
    pred, gt = pred[mask], gt[mask]
    n = pred.numel()
    g = torch.log(pred) - torch.log(gt)
    dg = (torch.sum(g**2) / n) - ((lam / (n**2)) * (torch.sum(g) ** 2))
    return alpha * torch.sqrt(dg)


def test_silog_matches_torch():
    pred = RNG.uniform(0.1, 9.0, size=(2, 1, 8, 10)).astype(np.float32)
    gt = RNG.uniform(0.1, 9.0, size=(2, 1, 16, 20)).astype(np.float32)
    mask = RNG.uniform(size=gt.shape) < 0.8

    want = _torch_silog(
        torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(mask)
    ).item()
    got = float(
        silog_loss(
            jnp.asarray(pred.transpose(0, 2, 3, 1)),
            jnp.asarray(gt.transpose(0, 2, 3, 1)),
            jnp.asarray(mask.transpose(0, 2, 3, 1)),
        )
    )
    # fp32 summation-order noise is amplified by the sqrt of a cancellation
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_loss_wrapper_weighted_sum():
    pred = RNG.uniform(0.1, 9.0, size=(2, 8, 10, 1)).astype(np.float32)
    gt = RNG.uniform(0.1, 9.0, size=(2, 8, 10, 1)).astype(np.float32)
    mask = np.ones_like(gt, dtype=bool)
    edges = np.sort(RNG.uniform(0.001, 10, size=(2, 17)).astype(np.float32), axis=1)

    lw = LossWrapper(["silog", "bins_chamfer"], [1.0, 0.1])
    total = float(lw(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask),
                     jnp.asarray(edges)))
    s = float(silog_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    assert total > s  # chamfer adds a positive term
    lw2 = LossWrapper(["silog"], [1.0])
    t2 = float(lw2(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    np.testing.assert_allclose(t2, s, rtol=1e-6)


def _reference_metric_values(pred, gt):
    """Pixel-family formulas from metrics/*.py on pre-masked 1-D arrays."""
    diff = gt - pred
    ratio = np.maximum(gt / pred, pred / gt)
    return {
        "abs_rel": np.mean(np.abs(diff) / gt),
        "sq_rel": np.mean(diff**2 / gt),
        "rmse": np.sqrt(np.mean(diff**2)),
        "rmse_log": np.sqrt(np.mean((np.log(gt) - np.log(pred)) ** 2)),
        "log10": np.mean(np.abs(np.log10(gt) - np.log10(pred))),
        "acc_1": np.mean(ratio < 1.25),
        "acc_2": np.mean(ratio < 1.25**2),
        "acc_3": np.mean(ratio < 1.25**3),
    }


def test_metrics_two_updates_match_reference():
    state = metrics_init()
    preds, gts, masks = [], [], []
    for _ in range(2):
        pred = RNG.uniform(0.1, 9.0, size=(1, 6, 7, 1)).astype(np.float32)
        gt = RNG.uniform(0.1, 9.0, size=(1, 6, 7, 1)).astype(np.float32)
        mask = RNG.uniform(size=gt.shape) < 0.7
        mask[0, 0, 0, 0] = True
        state = metrics_update(
            state, jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)
        )
        preds.append(pred[mask])
        gts.append(gt[mask])
    out = {k: float(v) for k, v in metrics_compute(state).items()}

    # pixel family pools all masked pixels
    pooled = _reference_metric_values(np.concatenate(preds), np.concatenate(gts))
    for name, want in pooled.items():
        np.testing.assert_allclose(out[name], want, rtol=1e-4, err_msg=name)

    # running-average family averages per-update values
    per_update = [_reference_metric_values(p, g) for p, g in zip(preds, gts)]
    for name in pooled:
        vals = [u[name] for u in per_update]
        if name == "rmse_log":  # reference quirk: RA has no sqrt
            vals = [v**2 for v in vals]
        np.testing.assert_allclose(
            out[f"{name}_ra"], np.mean(vals), rtol=1e-4, err_msg=name
        )


def test_metrics_preprocess_eigen_crop_nyu():
    cfg = MetricsPreprocessConfig(
        min_depth=0.001, max_depth=10.0, eigen_crop=True, dataset="nyu"
    )
    pred = RNG.uniform(0.1, 9.0, size=(1, 240, 320, 1)).astype(np.float32)
    pred[0, 3, 3, 0] = np.nan
    pred[0, 4, 4, 0] = np.inf
    gt = RNG.uniform(0.0, 11.0, size=(1, 480, 640, 1)).astype(np.float32)
    pred_out, mask = metrics_preprocess(jnp.asarray(pred), jnp.asarray(gt), cfg)
    pred_out = np.asarray(pred_out)
    mask = np.asarray(mask)
    assert pred_out.shape == gt.shape
    assert np.isfinite(pred_out).all()
    # outside the eigen crop nothing is valid
    assert not mask[0, :45].any() and not mask[0, 471:].any()
    assert not mask[0, :, :41].any() and not mask[0, :, 601:].any()
    inside = (gt[0, 45:471, 41:601, 0] > 0.001) & (gt[0, 45:471, 41:601, 0] <= 10.0)
    np.testing.assert_array_equal(mask[0, 45:471, 41:601, 0], inside)


def test_metrics_zero_valid_update_skipped():
    """A fully-masked update (padded/empty image) must not fold a spurious 0
    into the running-average family, nor touch the pixel totals."""
    state = metrics_init()
    pred = RNG.uniform(0.1, 9.0, size=(1, 4, 5, 1)).astype(np.float32)
    gt = RNG.uniform(0.1, 9.0, size=(1, 4, 5, 1)).astype(np.float32)
    mask = np.ones_like(gt, dtype=bool)
    state = metrics_update(state, jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask))
    before = {k: float(v) for k, v in metrics_compute(state).items()}
    state = metrics_update(
        state, jnp.asarray(pred), jnp.asarray(gt), jnp.zeros_like(mask)
    )
    after = {k: float(v) for k, v in metrics_compute(state).items()}
    for k in before:
        np.testing.assert_allclose(after[k], before[k], rtol=0, err_msg=k)


def test_chamfer_all_invalid_row_excluded():
    """An all-invalid row (padded eval sample) contributes nothing; loss over
    [valid, padded] equals loss over [valid] alone and stays finite."""
    from objcavit_tpu.ops.chamfer import masked_chamfer_1d

    x = jnp.asarray(RNG.uniform(0.1, 9.0, size=(2, 6)).astype(np.float32))
    y = jnp.asarray(RNG.uniform(0.1, 9.0, size=(2, 11)).astype(np.float32))
    mask = np.ones((2, 11), bool)
    mask[1] = False  # second sample fully padded
    got = float(masked_chamfer_1d(x, y, jnp.asarray(mask)))
    want = float(masked_chamfer_1d(x[:1], y[:1], jnp.ones((1, 11), bool)))
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_loss_wrapper_padded_sample_invariance():
    """The logged eval loss must be identical whether or not a zero-masked
    padded sample rides along in the batch (training/steps.py eval_step)."""
    pred = RNG.uniform(0.1, 9.0, size=(1, 8, 10, 1)).astype(np.float32)
    gt = RNG.uniform(0.1, 9.0, size=(1, 8, 10, 1)).astype(np.float32)
    edges = np.sort(RNG.uniform(0.001, 10, size=(1, 17)).astype(np.float32), axis=1)
    lw = LossWrapper(["silog", "bins_chamfer"], [1.0, 0.1])

    alone = float(lw(jnp.asarray(pred), jnp.asarray(gt),
                     jnp.ones_like(gt, bool), jnp.asarray(edges)))
    pad = np.zeros_like(pred)
    pred2 = np.concatenate([pred, pad + 1.0])
    gt2 = np.concatenate([gt, pad])  # padded gt is zeros
    mask2 = np.concatenate([np.ones_like(gt, bool), np.zeros_like(gt, bool)])
    edges2 = np.concatenate([edges, edges])
    padded = float(lw(jnp.asarray(pred2), jnp.asarray(gt2),
                      jnp.asarray(mask2), jnp.asarray(edges2)))
    assert np.isfinite(padded)
    np.testing.assert_allclose(padded, alone, rtol=1e-6)
