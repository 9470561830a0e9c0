"""Jit-compiled train / eval steps and the model factory.

One train step = device-side augmentation -> forward -> loss -> grad ->
clip -> AdamW update, all inside a single XLA program compiled once over the
mesh (batch sharded on the data axis, params replicated — XLA inserts the
gradient all-reduce). This collapses the reference's python-level step
(separate kornia launch, forward, backward, optimizer, DDP hooks;
GraphBinsLM.py:124-146 + Lightning internals) into one fused program.

Eval replaces the reference's two sequential forwards for flip-TTA
(GraphBinsLM.py:159-183) with a single forward on a 2B-batch of
[images; mirrored images] — better MXU utilisation, same numbers.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from objcavit_tpu.data.augment import augment_batch
from objcavit_tpu.losses import LossWrapper
from objcavit_tpu.metrics import (
    MetricsPreprocessConfig,
    metrics_preprocess,
    metrics_update,
)
from objcavit_tpu.models import AdaBins, GraphBins


def image_seq_len(h: int, w: int, do_final_upscale: bool = False,
                  patch: int = 16) -> int:
    """ObjCAViT's image-token sequence length for an (h, w) network input:
    dense features at half resolution (full with do_final_upscale), then
    16px patches (ObjCAViT.py:287-288; feature res DenseFeatureExtractor)."""
    import math

    fh = h if do_final_upscale else math.ceil(h / 2)
    fw = w if do_final_upscale else math.ceil(w / 2)
    return math.ceil(fh / patch) * math.ceil(fw / patch)


def objects_capacity(args: Any, dims: tuple[int, int]) -> int:
    """Padded object-slot count for a given network input (h, w).

    Honours the reference's detection-capacity contract: the detector keeps
    up to ``yolov7seg.max_det`` detections (basicParams.yaml:34,
    Yolov7Wrapper.py:92-100) and ObjCAViT pads the object list to the image
    sequence length (ObjCAViT.py:191-194), so S is the effective ceiling:
    N_max = min(max_det, S). ``args.objects_max`` (not a reference key) is an
    explicit override for tests/benchmarks."""
    cap = args.get("objects_max")
    if cap is not None:
        return int(cap)
    max_det = 1000
    if "yolov7seg" in args:
        max_det = int(args.yolov7seg.get("max_det", 1000))
    fu = bool(args[args.model.name].get("do_final_upscale"))
    h, w = (int(x) for x in dims)
    return min(max_det, image_seq_len(h, w, fu))


def build_model(args: Any, dtype=jnp.float32, attn_impl: str = "xla"):
    """Model factory from a reference-format config tree."""
    name = args.model.name
    mcfg = args[name]
    dcfg = args[args.basic.dataset]
    common = dict(
        encoder_name=mcfg.encoder_name,
        n_bins=mcfg.n_bins,
        min_depth=dcfg.min_depth,
        max_depth=dcfg.max_depth,
        do_final_upscale=bool(mcfg.get("do_final_upscale")),
        dtype=dtype,
        attn_impl=attn_impl,
    )
    if name == "adabins":
        return AdaBins(**common)
    if name == "graphbins":
        ocfg = mcfg.objcavit
        return GraphBins(
            embedding_dim=ocfg.embedding_dim,
            obj_feature_dim=512,
            pos_strategy=ocfg.positional_embedding_strategy,
            no_obj_sa=bool(ocfg.get("no_obj_sa")),
            use_2_saca=bool(ocfg.get("use_2_saca")),
            dims_train=tuple(dcfg.dimensions_train),
            dims_test=tuple(dcfg.dimensions_test),
            **common,
        )
    raise ValueError(f"unrecognised model: {name}")


def make_train_loss_fn(
    model,
    loss_wrapper: LossWrapper,
    min_depth: float,
    augment_on_device: bool,
    is_graphbins: bool,
) -> Callable:
    """The train step's loss closure, exposed standalone so the multi-chip
    dryrun / DP-equivalence tests can jax.grad EXACTLY the arithmetic the
    train step differentiates (not a re-implementation that could drift):
    fn(params, batch_stats, batch, objects, rng) -> (loss, new_batch_stats).
    """

    def loss_fn(params, batch_stats, batch, objects, rng):
        image, depth_gt = batch["image"], batch["depth"]
        if augment_on_device:
            aug_rng, rng = jax.random.split(rng)
            image, depth_gt = augment_batch(aug_rng, image, depth_gt)
        inputs = (image,)
        if is_graphbins:
            inputs = (
                image, objects["features"], objects["xywh"], objects["valid"],
            )
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = model.apply(
            variables, *inputs, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng, "droppath": jax.random.fold_in(rng, 1)},
        )
        depth_mask = depth_gt > min_depth  # train mask: min only
        loss = loss_wrapper(
            out["depth_pred"], depth_gt, depth_mask, out["bin_edges"]
        )
        return loss, mutated["batch_stats"]

    return loss_fn


def make_train_step(
    model,
    tx,
    loss_wrapper: LossWrapper,
    min_depth: float,
    augment_on_device: bool,
    is_graphbins: bool,
) -> Callable:
    """Returns jittable fn(state, batch, objects, rng) -> (state, loss)."""

    loss_fn_full = make_train_loss_fn(
        model, loss_wrapper, min_depth, augment_on_device, is_graphbins
    )

    def train_step(state, batch, objects, rng):
        def loss_fn(params):
            return loss_fn_full(params, state.batch_stats, batch, objects, rng)

        (loss, new_batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        return new_state, loss

    return train_step


def make_bn_refresh_step(
    model,
    augment_on_device: bool,
    is_graphbins: bool,
    momentum: float = 0.1,
) -> Callable:
    """Per-batch BN-statistics extractor for the SWA refresh.

    ``torch.optim.swa_utils.update_bn`` semantics (what Lightning's
    StochasticWeightAveraging — reference main.py:41-43 — runs after
    swapping in the averaged weights): reset running stats, set momenta to
    None, and take the CUMULATIVE average of each batch's raw statistics
    under the averaged params. Flax BatchNorm only exposes the EMA
    ``new = (1 - m_torch) * old + m_torch * batch`` (common.BatchNorm), so
    applying from ZEROED stats recovers ``batch_stat = ema_out / m_torch``.
    The depth model uses torch momentum 0.1 uniformly (common.BatchNorm
    default; the 0.97-flax-momentum BNs live in the frozen detector, outside
    the train state). The caller averages the per-batch results.
    """

    def refresh_step(params, zero_stats, batch, objects, rng):
        image = batch["image"]
        if augment_on_device:
            aug_rng, rng = jax.random.split(rng)
            image, _ = augment_batch(aug_rng, image, batch["depth"])
        inputs = (image,)
        if is_graphbins:
            inputs = (
                image, objects["features"], objects["xywh"], objects["valid"],
            )
        _, mutated = model.apply(
            {"params": params, "batch_stats": zero_stats}, *inputs,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": rng, "droppath": jax.random.fold_in(rng, 1)},
        )
        return jax.tree.map(lambda s: s / momentum, mutated["batch_stats"])

    return refresh_step


def make_eval_step(
    model,
    loss_wrapper: LossWrapper,
    mp_cfg: MetricsPreprocessConfig,
    is_graphbins: bool,
    flip_tta: bool,
) -> Callable:
    """Returns jittable fn(params, batch_stats, batch, objects, objects_mirror,
    metric_state) -> (metric_state, loss, depth_pred_final).

    flip-TTA runs as one 2B-batched forward; per-sample validity masks keep
    padded final batches out of the metrics.
    """

    def forward(params, batch_stats, image, objects):
        inputs = (image,)
        if is_graphbins:
            inputs = (image, objects["features"], objects["xywh"], objects["valid"])
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, *inputs, train=False
        )

    def eval_step(params, batch_stats, batch, objects, objects_mirror, metric_state):
        image, depth_gt = batch["image"], batch["depth"]
        b = image.shape[0]

        if flip_tta:
            image2 = jnp.concatenate([image, image[:, :, ::-1, :]], axis=0)
            if is_graphbins:
                objects2 = jax.tree.map(
                    lambda a, m: jnp.concatenate([a, m], axis=0),
                    objects, objects_mirror,
                )
            else:
                objects2 = objects
            out = forward(params, batch_stats, image2, objects2)
            pred = out["depth_pred"][:b]
            pred_mirror = out["depth_pred"][b:][:, :, ::-1, :]
            pred = jnp.clip(pred, mp_cfg.min_depth, mp_cfg.max_depth)
            pred_mirror = jnp.clip(pred_mirror, mp_cfg.min_depth, mp_cfg.max_depth)
            depth_pred = 0.5 * (pred + pred_mirror)
            bin_edges = out["bin_edges"][:b]
        else:
            out = forward(params, batch_stats, image, objects)
            depth_pred = jnp.clip(
                out["depth_pred"], mp_cfg.min_depth, mp_cfg.max_depth
            )
            bin_edges = out["bin_edges"]

        # padded samples (final partial batch) are excluded from the logged
        # loss too, not just the metrics: their mask pixels go False, silog's
        # count and chamfer's per-row validity then skip them entirely
        sample_valid = batch["sample_valid"][:, None, None, None]
        depth_mask = (depth_gt > mp_cfg.min_depth) & (depth_gt <= mp_cfg.max_depth)
        depth_mask = depth_mask & sample_valid
        loss = loss_wrapper(depth_pred, depth_gt, depth_mask, bin_edges)

        pred_m, mask_m = metrics_preprocess(depth_pred, depth_gt, mp_cfg)
        # padded samples (final partial batch) contribute nothing
        mask_m = mask_m & batch["sample_valid"][:, None, None, None]
        metric_state = metrics_update(metric_state, pred_m, depth_gt, mask_m)
        return metric_state, loss, depth_pred

    return eval_step
