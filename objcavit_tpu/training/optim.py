"""Optimizer: AdamW + OneCycle schedule with cycled momentum (optax).

Replicates GraphBinsLM.configure_optimizers (:455-484) + the trainer's
gradient clipping (main.py:35-38, Lightning clips by global L2 norm):

  * AdamW(lr=args.optimizer.lr, weight_decay=args.optimizer.wd)
  * OneCycleLR per step: cosine anneal, pct_start 0.3 (torch default),
    div_factor / final_div_factor from config, momentum (beta1) cycled
    0.95 -> 0.85 -> 0.95
  * grad clip by global norm (gradient_clip_val)

Parity quirk kept: torch's OneCycleLR with a scalar max_lr overwrites every
param group's LR, so the reference's ``slow_encoder`` param group has NO
effect whenever the OneCycle schedule is active (i.e. whenever use_swa is
off — all released configs). We replicate that: the encoder LR division is
applied only on the SWA (plain-AdamW) path.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def onecycle_momentum_schedule(
    total_steps: int,
    base_momentum: float = 0.85,
    max_momentum: float = 0.95,
    pct_start: float = 0.3,
) -> Callable:
    """torch OneCycleLR momentum cycle: max -> base -> max (cos anneal)."""
    up = max(int(pct_start * total_steps), 1)
    down = max(total_steps - up, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        phase1 = 0.5 * (1 + jnp.cos(jnp.pi * jnp.minimum(step / up, 1.0)))
        m1 = base_momentum + (max_momentum - base_momentum) * phase1
        t2 = jnp.clip((step - up) / down, 0.0, 1.0)
        phase2 = 0.5 * (1 + jnp.cos(jnp.pi * t2))
        m2 = max_momentum + (base_momentum - max_momentum) * phase2
        return jnp.where(step < up, m1, m2)

    return schedule


def _encoder_label_tree(params: Any) -> Any:
    """Label each leaf 'encoder' or 'other' based on its path (the encoder
    lives under dense_feature_extractor/encoder, GraphBins.py:38-39)."""

    def label(path, _):
        keys = [getattr(p, "key", "") for p in path]
        return "encoder" if "encoder" in keys else "other"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(
    lr: float,
    weight_decay: float,
    total_steps: int,
    div_factor: float = 25.0,
    final_div_factor: float = 100.0,
    gradient_clip_val: float = 0.0,
    use_swa: bool = False,
    slow_encoder: float | None = None,
    params_example: Any = None,
) -> optax.GradientTransformation:
    chain = []
    if gradient_clip_val and gradient_clip_val > 0:
        chain.append(optax.clip_by_global_norm(gradient_clip_val))

    if not use_swa:
        lr_schedule = optax.cosine_onecycle_schedule(
            transition_steps=total_steps,
            peak_value=lr,
            pct_start=0.3,
            div_factor=div_factor,
            final_div_factor=final_div_factor,
        )
        b1_schedule = onecycle_momentum_schedule(total_steps)
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr_schedule, b1=b1_schedule, weight_decay=weight_decay
        )
        chain.append(opt)
        return optax.chain(*chain)

    # SWA path: constant LRs; here the slow-encoder param group does apply
    if slow_encoder and params_example is not None:
        labels = _encoder_label_tree(params_example)
        opt = optax.multi_transform(
            {
                "encoder": optax.adamw(lr / slow_encoder, weight_decay=weight_decay),
                "other": optax.adamw(lr, weight_decay=weight_decay),
            },
            labels,
        )
    else:
        opt = optax.adamw(lr, weight_decay=weight_decay)
    chain.append(opt)
    return optax.chain(*chain)
