"""Optimizer: AdamW + OneCycle schedule with cycled momentum (optax).

Replicates GraphBinsLM.configure_optimizers (:455-490) + main.py's SWA
callback wiring (:41-43) + the trainer's gradient clipping (main.py:35-38,
Lightning clips by global L2 norm). Reference semantics:

  * AdamW(lr=args.optimizer.lr, weight_decay=args.optimizer.wd)
  * OneCycleLR per-step whenever ``use_swa`` is ABSENT **or True**
    (GraphBinsLM.py:470 ``"use_swa" not in ... or ... use_swa``); plain
    constant-LR AdamW only when use_swa is explicitly False.
  * use_swa=True ADDITIONALLY adds Lightning's
    StochasticWeightAveraging(swa_lrs=1e-2) (main.py:41-43): from epoch
    0.8*max_epochs the LR anneals (cos) from its current value to 1e-2 and
    weights are averaged once per epoch (averaging lives in the train loop).
  * grad clip by global norm (gradient_clip_val)

``torch_onecycle_schedule`` matches torch.optim.lr_scheduler.OneCycleLR
step-for-step (cos anneal, phase end at pct_start*total - 1), pinned by
tests/test_optim.py against the torch implementation.

Parity quirk kept: torch's OneCycleLR with a scalar max_lr overwrites every
param group's LR, so the reference's ``slow_encoder`` param group has NO
effect whenever the OneCycle schedule is active (use_swa absent or True —
all released configs). The encoder LR division applies only on the explicit
use_swa=False (plain-AdamW) path.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def _annealing_cos(start, end, pct):
    """torch OneCycleLR._annealing_cos."""
    return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))


def torch_onecycle_schedule(
    total_steps: int,
    peak_value: float,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> Callable:
    """Exact torch OneCycleLR (anneal_strategy='cos') as a step->lr fn.

    torch phase boundaries: up ends at float(pct_start*total)-1, down ends
    at total-1 (lr_scheduler.py _schedule_phases).
    """
    initial = peak_value / div_factor
    final = initial / final_div_factor
    end1 = max(float(pct_start * total_steps) - 1.0, 1e-8)
    end2 = max(float(total_steps) - 1.0, 1e-8)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        lr_up = _annealing_cos(initial, peak_value, jnp.minimum(s / end1, 1.0))
        pct2 = jnp.clip((s - end1) / (end2 - end1), 0.0, 1.0)
        lr_down = _annealing_cos(peak_value, final, pct2)
        return jnp.where(s <= end1, lr_up, lr_down)

    return schedule


def onecycle_momentum_schedule(
    total_steps: int,
    base_momentum: float = 0.85,
    max_momentum: float = 0.95,
    pct_start: float = 0.3,
) -> Callable:
    """torch OneCycleLR momentum cycle: max -> base -> max (cos anneal),
    same phase boundaries as the LR."""
    end1 = max(float(pct_start * total_steps) - 1.0, 1e-8)
    end2 = max(float(total_steps) - 1.0, 1e-8)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        m_up = _annealing_cos(max_momentum, base_momentum,
                              jnp.minimum(s / end1, 1.0))
        pct2 = jnp.clip((s - end1) / (end2 - end1), 0.0, 1.0)
        m_down = _annealing_cos(base_momentum, max_momentum, pct2)
        return jnp.where(s <= end1, m_up, m_down)

    return schedule


def swa_lr_schedule(
    onecycle: Callable,
    swa_start_step: int,
    anneal_steps: int,
    swa_lr: float = 1e-2,
) -> Callable:
    """Lightning SWA LR: OneCycle until swa_start, then SWALR cosine anneal
    from the LR at the switch to ``swa_lr`` (SWALR._cosine_anneal:
    alpha = (1 - cos(pi t))/2, lr = prev*(1-alpha) + swa_lr*alpha)."""
    lr_at_switch = onecycle(swa_start_step)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        t = jnp.clip((s - swa_start_step) / max(anneal_steps, 1), 0.0, 1.0)
        alpha = (1.0 - jnp.cos(jnp.pi * t)) / 2.0
        swa = lr_at_switch * (1.0 - alpha) + swa_lr * alpha
        return jnp.where(s < swa_start_step, onecycle(s), swa)

    return schedule


def current_lr(opt_state: Any):
    """Learning rate recorded by inject_hyperparams in the optimizer state
    (the value used by the MOST RECENT update). Returns None on the plain
    constant-LR AdamW path. Powers the reference's LearningRateMonitor
    parity (main.py:33) without re-deriving the schedule host-side."""
    hp = getattr(opt_state, "hyperparams", None)
    if isinstance(hp, dict) and "learning_rate" in hp:
        return float(jax.device_get(hp["learning_rate"]))
    if isinstance(opt_state, (tuple, list)):
        for s in opt_state:
            lr = current_lr(s)
            if lr is not None:
                return lr
    return None


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
    use_swa: bool | None = None,
    slow_encoder: float | None = None,
    params_example: Any = None,
    swa_start_step: int | None = None,
    swa_anneal_steps: int = 1,
    swa_lrs: float = 1e-2,
) -> optax.GradientTransformation:
    """use_swa: None = key absent from config (OneCycle, the usual case);
    True = OneCycle + SWA LR switch at swa_start_step (weight averaging is
    the loop's job); False = plain constant-LR AdamW (slow_encoder applies
    here only — see module docstring)."""
    chain = []
    if gradient_clip_val and gradient_clip_val > 0:
        chain.append(optax.clip_by_global_norm(gradient_clip_val))

    if use_swa is None or use_swa:
        lr_schedule = torch_onecycle_schedule(
            total_steps=total_steps,
            peak_value=lr,
            pct_start=0.3,
            div_factor=div_factor,
            final_div_factor=final_div_factor,
        )
        b1_schedule = onecycle_momentum_schedule(total_steps)
        if use_swa:
            start = (
                swa_start_step
                if swa_start_step is not None
                else int(0.8 * total_steps)
            )
            cycle_b1 = b1_schedule
            lr_schedule = swa_lr_schedule(
                lr_schedule, start, swa_anneal_steps, swa_lrs
            )
            # Lightning swaps the scheduler at swa_start: momentum cycling
            # stops there too (frozen at its switch value).
            b1_schedule = lambda s: jnp.where(  # noqa: E731
                jnp.asarray(s, jnp.float32) < start, cycle_b1(s), cycle_b1(start)
            )
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr_schedule, b1=b1_schedule, weight_decay=weight_decay
        )
        chain.append(opt)
        return optax.chain(*chain)

    # use_swa explicitly False: plain AdamW, constant LR; the slow-encoder
    # param group survives (no OneCycle to overwrite it)
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
