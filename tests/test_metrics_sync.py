"""Cross-replica metric sync (torchmetrics DDP dist_reduce_fx parity).

Simulates 8 data-parallel workers each updating a shard-local metric state,
then merges with metrics_sync (shard_map + psum/pmean over the mesh's data
axis). Pixel-weighted metrics must equal the single-stream global result
exactly (sum-of-sums); running averages follow the reference's DDP semantics:
running_avg has dist_reduce_fx='mean', batch_count 'sum' (AbsRel.py:17-18).
"""

import numpy as np

import jax

from objcavit_tpu.metrics import (
    METRIC_NAMES,
    metrics_compute,
    metrics_init,
    metrics_sync,
    metrics_update,
)
from objcavit_tpu.parallel import make_mesh


def _fake_batch(rng, b=2, h=8, w=12):
    gt = rng.uniform(0.5, 9.0, (b, h, w, 1)).astype(np.float32)
    pred = np.clip(gt + rng.normal(0, 0.5, gt.shape), 0.01, 10).astype(np.float32)
    mask = rng.uniform(size=gt.shape) < 0.7
    return pred, gt, mask


def test_metrics_sync_matches_ddp_semantics():
    n_workers = 8
    rng = np.random.default_rng(0)
    batches = [_fake_batch(rng) for _ in range(n_workers)]

    # single-stream global accumulation (order doesn't matter for sums)
    global_state = metrics_init()
    for pred, gt, mask in batches:
        global_state = metrics_update(global_state, pred, gt, mask)

    # 8 shard-local states, one batch each
    local_states = []
    for pred, gt, mask in batches:
        local_states.append(metrics_update(metrics_init(), pred, gt, mask))
    stacked = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *local_states
    )

    mesh = make_mesh()
    merged = metrics_sync(stacked, mesh)

    out_merged = {k: float(v) for k, v in metrics_compute(merged).items()}
    out_global = {k: float(v) for k, v in metrics_compute(global_state).items()}
    for name in METRIC_NAMES:
        # pixel family: sums-of-sums -> exact agreement with single stream
        assert out_merged[name] == pytest_approx(out_global[name]), name
        # RA family: mean over worker averages; with one batch per worker the
        # per-worker average IS its batch value, so the merged RA equals the
        # single-stream RA (uniform batch weighting) too
        assert out_merged[f"{name}_ra"] == pytest_approx(
            out_global[f"{name}_ra"]
        ), f"{name}_ra"
    # counts summed across workers
    assert float(merged["abs_rel/count"]) == float(global_state["abs_rel/count"])
    assert float(merged["abs_rel_ra/count"]) == n_workers


def pytest_approx(x, rel=1e-5):
    import pytest

    return pytest.approx(x, rel=rel, abs=1e-6)
