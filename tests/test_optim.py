"""Optimizer-schedule parity vs torch, and the use_swa tri-state.

Reference semantics under test (GraphBinsLM.py:470-490, main.py:41-43):
  * OneCycleLR whenever use_swa is absent or True — LR and cycled momentum
    pinned step-for-step against torch.optim.lr_scheduler.OneCycleLR.
  * use_swa=True adds the Lightning SWA LR switch (anneal to swa_lrs=1e-2
    from 0.8*total) on top of OneCycle.
  * use_swa=False: plain constant-LR AdamW; slow_encoder group applies.
"""

import numpy as np
import pytest

from objcavit_tpu.training.optim import (
    build_optimizer,
    onecycle_momentum_schedule,
    swa_lr_schedule,
    torch_onecycle_schedule,
)


def _torch_onecycle(total, lr, div=25.0, final_div=100.0):
    torch = pytest.importorskip("torch")
    m = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(m.parameters(), lr=lr)
    sch = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=lr, total_steps=total, cycle_momentum=True,
        base_momentum=0.85, max_momentum=0.95, div_factor=div,
        final_div_factor=final_div,
    )
    lrs, moms = [], []
    for _ in range(total):
        lrs.append(opt.param_groups[0]["lr"])
        moms.append(opt.param_groups[0]["betas"][0])
        opt.step()
        sch.step()
    return np.asarray(lrs), np.asarray(moms)


@pytest.mark.parametrize("total", [50, 1000])
def test_onecycle_lr_and_momentum_match_torch(total):
    lr = 3.57e-4
    want_lr, want_mom = _torch_onecycle(total, lr)
    lsch = torch_onecycle_schedule(total, lr, div_factor=25, final_div_factor=100)
    msch = onecycle_momentum_schedule(total)
    got_lr = np.asarray([float(lsch(i)) for i in range(total)])
    got_mom = np.asarray([float(msch(i)) for i in range(total)])
    # fp32 cos in the jnp schedule: ~2e-5 relative noise vs torch float64
    np.testing.assert_allclose(got_lr, want_lr, rtol=1e-4)
    np.testing.assert_allclose(got_mom, want_mom, rtol=1e-4)


def test_swa_lr_switch():
    total, lr = 100, 3.57e-4
    base = torch_onecycle_schedule(total, lr)
    sch = swa_lr_schedule(base, swa_start_step=80, anneal_steps=10, swa_lr=1e-2)
    # before the switch: pure OneCycle
    for s in (0, 40, 79):
        assert float(sch(s)) == pytest.approx(float(base(s)), rel=1e-6)
    # at the switch: still the OneCycle value (alpha=0)
    assert float(sch(80)) == pytest.approx(float(base(80)), rel=1e-6)
    # after annealing: constant swa_lr
    assert float(sch(90)) == pytest.approx(1e-2, rel=1e-6)
    assert float(sch(99)) == pytest.approx(1e-2, rel=1e-6)
    # midway: strictly between
    mid = float(sch(85))
    assert float(base(80)) < mid < 1e-2


def _lr_of(tx, step, params):
    """Drive the optax chain `step` times and read the applied scale."""
    import jax
    import jax.numpy as jnp

    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    for _ in range(step + 1):
        updates, state = tx.update(grads, state, params)
    return updates


def test_use_swa_tristate():
    import jax.numpy as jnp

    params = {"dense_feature_extractor": {"encoder": {"w": jnp.ones(3)},
                                          "decoder": {"w": jnp.ones(3)}}}
    # absent -> schedule present (hyperparams injected)
    tx = build_optimizer(1e-3, 0.1, total_steps=10, use_swa=None)
    assert tx.init(params) is not None
    # False -> constant LR, slow_encoder group applies
    tx_f = build_optimizer(
        1e-3, 0.0, total_steps=10, use_swa=False, slow_encoder=10.0,
        params_example=params,
    )
    upd = _lr_of(tx_f, 0, params)
    enc = float(upd["dense_feature_extractor"]["encoder"]["w"][0])
    dec = float(upd["dense_feature_extractor"]["decoder"]["w"][0])
    # AdamW on constant gradient: update magnitude proportional to lr
    assert abs(enc / dec - 0.1) < 0.01
    # True -> OneCycle + SWA switch built without error
    tx_t = build_optimizer(
        1e-3, 0.1, total_steps=10, use_swa=True, swa_start_step=8,
        swa_anneal_steps=2,
    )
    assert tx_t.init(params) is not None
