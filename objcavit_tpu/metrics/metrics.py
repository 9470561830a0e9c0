"""Depth-eval metrics as a pure pytree state machine (torchmetrics parity).

The reference keeps 16 torchmetrics objects (metrics/*.py, 6 metrics x
{pixel-weighted, per-image running-average} + 3 delta thresholds), updated with
boolean-masked (ragged) tensors. Here metric state is a flat dict of scalars,
updates are fixed-shape masked reductions inside jit, and cross-replica
reduction is a single ``jax.lax.psum``/``pmean`` over the mesh instead of
torchmetrics' DDP ``dist_reduce_fx`` (metrics/AbsRel.py:42-43).

Replicated formulas (citations into /root/reference/metrics):
  pixel family: state = (sum of per-pixel terms, valid pixel count)
    abs_rel  = sum(|gt - pred| / gt) / n                 (AbsRel.py:50-56)
    sq_rel   = sum((gt - pred)^2 / gt) / n               (SqRel.py)
    rmse     = sqrt(sum((gt - pred)^2) / n)              (RMSE.py)
    rmse_log = sqrt(sum((ln gt - ln pred)^2) / n)        (RMSELog.py)
    log10    = sum(|log10 gt - log10 pred|) / n          (Log10.py)
    acc_k    = sum(max(gt/pred, pred/gt) < 1.25^k) / n   (AccThresh.py)
  running-average family: state = (running_avg, batch_count); each update is
  the per-call masked mean, folded in as
    avg <- (val + avg * count) / (count + 1)             (AbsRel.py:21-27)
  Quirk kept for parity: the rmse_log running average has NO sqrt — it averages
  per-image mean squared log error (RMSELog.py RunningAvg.update).

``metrics_preprocess`` replicates metrics/MetricsPreprocess.py: upsample
(bilinear, align_corners=True), nan -> min_depth / +-inf -> max_depth, validity
mask (min < gt <= max), and the Garg / Eigen evaluation crops.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from objcavit_tpu.ops.resize import resize_bilinear

METRIC_NAMES = (
    "abs_rel",
    "sq_rel",
    "rmse",
    "rmse_log",
    "log10",
    "acc_1",
    "acc_2",
    "acc_3",
)

_THRESHOLDS = {"acc_1": 1.25, "acc_2": 1.25**2, "acc_3": 1.25**3}


def metrics_init() -> Dict[str, jax.Array]:
    """Zeroed metric state pytree (all float32 scalars)."""
    state = {}
    for name in METRIC_NAMES:
        state[f"{name}/total"] = jnp.zeros((), jnp.float32)
        state[f"{name}/count"] = jnp.zeros((), jnp.float32)
        state[f"{name}_ra/avg"] = jnp.zeros((), jnp.float32)
        state[f"{name}_ra/count"] = jnp.zeros((), jnp.float32)
    return state


def _per_pixel_terms(pred: jax.Array, gt: jax.Array) -> Dict[str, jax.Array]:
    diff = gt - pred
    log_diff = jnp.log(gt) - jnp.log(pred)
    ratio = jnp.maximum(gt / pred, pred / gt)
    terms = {
        "abs_rel": jnp.abs(diff) / gt,
        "sq_rel": (diff * diff) / gt,
        "rmse": diff * diff,
        "rmse_log": log_diff * log_diff,
        "log10": jnp.abs(jnp.log10(gt) - jnp.log10(pred)),
    }
    for name, thr in _THRESHOLDS.items():
        terms[name] = (ratio < thr).astype(jnp.float32)
    return terms


def metrics_update(
    state: Dict[str, jax.Array],
    depth_pred: jax.Array,
    depth_gt: jax.Array,
    mask: jax.Array,
) -> Dict[str, jax.Array]:
    """Fold one (pred, gt, validity-mask) batch into the metric state.

    All arrays share one shape; only pixels with mask True participate. One
    call corresponds to one torchmetrics ``update`` on the masked selection.
    """
    m = mask.astype(jnp.float32)
    n = jnp.sum(m)
    safe_n = jnp.maximum(n, 1.0)
    terms = _per_pixel_terms(depth_pred.astype(jnp.float32), depth_gt.astype(jnp.float32))
    new = dict(state)
    for name in METRIC_NAMES:
        t = jnp.where(mask, terms[name], 0.0)
        total = jnp.sum(t)
        new[f"{name}/total"] = state[f"{name}/total"] + total
        new[f"{name}/count"] = state[f"{name}/count"] + n
        # running-average family: per-call masked mean
        val = total / safe_n
        if name == "rmse":
            val = jnp.sqrt(val)
        # rmse_log RunningAvg quirk: no sqrt (RMSELog.py)
        cnt = state[f"{name}_ra/count"]
        # zero-valid-pixel updates (fully-masked image) are skipped rather
        # than folding a spurious 0 into the running average (torchmetrics
        # would propagate a mean-of-empty nan; skipping is the sane policy)
        has_px = n > 0.0
        new[f"{name}_ra/avg"] = jnp.where(
            has_px,
            (val + state[f"{name}_ra/avg"] * cnt) / (cnt + 1.0),
            state[f"{name}_ra/avg"],
        )
        new[f"{name}_ra/count"] = jnp.where(has_px, cnt + 1.0, cnt)
    return new


def metrics_compute(state: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Final metric values: 8 pixel-weighted + 8 running-average ("_ra")."""
    out = {}
    for name in METRIC_NAMES:
        v = state[f"{name}/total"] / jnp.maximum(state[f"{name}/count"], 1.0)
        if name in ("rmse", "rmse_log"):
            v = jnp.sqrt(v)
        out[name] = v
        out[f"{name}_ra"] = state[f"{name}_ra/avg"]
    return out


def metrics_reduce(state: Dict[str, jax.Array], axis_name: str) -> Dict[str, jax.Array]:
    """Cross-replica reduction: sums are psum'd, running averages pmean'd —
    torchmetrics dist_reduce_fx parity (AbsRel.py:17-18: batch_count 'sum',
    running_avg 'mean'). Call once at compute time via ``metrics_sync``."""
    out = {}
    for key, val in state.items():
        if key.endswith("_ra/avg"):
            out[key] = jax.lax.pmean(val, axis_name)
        else:
            out[key] = jax.lax.psum(val, axis_name)
    return out


def metrics_sync(shard_states: Dict[str, jax.Array], mesh) -> Dict[str, jax.Array]:
    """Merge per-shard metric states into one global state (the one-shot
    dist-sync torchmetrics performs at compute()).

    shard_states: each leaf is (n_shards,) — one entry per data-parallel
    worker, stacked on axis 0 and sharded (or shardable) over the mesh's data
    axis. Runs metrics_reduce inside shard_map so the reduction is an ICI
    collective, not a host gather.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from objcavit_tpu.parallel.mesh import DATA_AXIS

    n_data = mesh.shape[DATA_AXIS]
    leading = {x.shape[0] for x in jax.tree.leaves(shard_states)}
    if leading != {n_data}:  # not assert: must survive `python -O`
        raise ValueError(
            f"metrics_sync needs one state per data-axis worker: leading dims "
            f"{leading} vs data axis {n_data} (a larger stack would silently "
            f"drop entries — merge host-side first)"
        )
    spec_in = P(DATA_AXIS)
    shard_states = jax.device_put(
        shard_states, NamedSharding(mesh, spec_in)
    )

    @jax.jit
    def run(states):
        def body(local):
            local = jax.tree.map(lambda x: x[0], local)  # (1,) -> scalar
            reduced = metrics_reduce(local, DATA_AXIS)
            return jax.tree.map(lambda x: x[None], reduced)

        f = shard_map(
            body, mesh=mesh,
            in_specs=(spec_in,), out_specs=P(None),
            check_rep=False,
        )
        return jax.tree.map(lambda x: x[0], f(states))

    return run(shard_states)


@dataclasses.dataclass(frozen=True)
class MetricsPreprocessConfig:
    min_depth: float
    max_depth: float
    garg_crop: bool = False
    eigen_crop: bool = False
    dataset: str = "nyu"


def metrics_preprocess(
    depth_pred: jax.Array,
    depth_gt: jax.Array,
    cfg: MetricsPreprocessConfig,
) -> tuple[jax.Array, jax.Array]:
    """Upsample + de-nan/inf the prediction; build the evaluation mask.

    Args are NHWC (N, H, W, 1). Returns (pred at GT resolution, bool mask).
    """
    gt_h, gt_w = depth_gt.shape[1], depth_gt.shape[2]
    depth_pred = resize_bilinear(depth_pred, gt_h, gt_w, align_corners=True)
    depth_pred = jnp.nan_to_num(
        depth_pred, nan=cfg.min_depth, posinf=cfg.max_depth, neginf=cfg.max_depth
    )
    mask = (depth_gt > cfg.min_depth) & (depth_gt <= cfg.max_depth)

    if cfg.garg_crop or cfg.eigen_crop:
        eval_mask = jnp.zeros((gt_h, gt_w), dtype=bool)
        if cfg.garg_crop:
            eval_mask = eval_mask.at[
                int(0.40810811 * gt_h) : int(0.99189189 * gt_h),
                int(0.03594771 * gt_w) : int(0.96405229 * gt_w),
            ].set(True)
        elif cfg.eigen_crop:
            if cfg.dataset == "kitti":
                eval_mask = eval_mask.at[
                    int(0.3324324 * gt_h) : int(0.91351351 * gt_h),
                    int(0.0359477 * gt_w) : int(0.96405229 * gt_w),
                ].set(True)
            else:
                eval_mask = eval_mask.at[45:471, 41:601].set(True)
        mask = mask & eval_mask[None, :, :, None]

    return depth_pred, mask
