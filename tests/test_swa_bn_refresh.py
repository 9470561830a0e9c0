"""SWA BN-statistics refresh (VERDICT r3 weak #4 / next-round #3).

Lightning's StochasticWeightAveraging (reference main.py:41-43) finishes by
recomputing BatchNorm running statistics FOR THE AVERAGED WEIGHTS with
``torch.optim.swa_utils.update_bn`` semantics: reset stats, momentum=None,
cumulative (equal-weight) average of each batch's raw statistics. Evaluating
averaged params against the last step's stale batch_stats shifts every BN
layer. Pinned here:

  * make_bn_refresh_step recovers the TRUE per-batch statistics (numpy
    oracle) through flax's EMA-only BatchNorm interface,
  * the Trainer's SWA finalisation swaps in batch_stats produced under the
    averaged params — not the last training step's.
"""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp
import flax.linen as nn

from objcavit_tpu.config import Config
from objcavit_tpu.models.common import BatchNorm
from objcavit_tpu.training.steps import make_bn_refresh_step


class _BNProbe(nn.Module):
    """Identity-conv + BatchNorm: batch statistics == input statistics."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return BatchNorm(name="bn")(x, use_running_average=not train)


def test_bn_refresh_step_recovers_true_batch_statistics():
    rng = np.random.default_rng(3)
    model = _BNProbe()
    x0 = rng.normal(2.0, 1.5, (4, 8, 8, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)

    refresh = jax.jit(
        make_bn_refresh_step(model, augment_on_device=False, is_graphbins=False)
    )
    zeros = jax.tree.map(jnp.zeros_like, variables["batch_stats"])

    batches = [
        rng.normal(mu, sig, (4, 8, 8, 3)).astype(np.float32)
        for mu, sig in [(0.0, 1.0), (3.0, 0.5), (-1.0, 2.0)]
    ]
    acc, k = None, 0
    for x in batches:
        stat = refresh(
            variables["params"], zeros, {"image": x, "depth": x[..., :1]},
            None, jax.random.PRNGKey(k),
        )
        k += 1
        acc = (
            stat if acc is None
            else jax.tree.map(lambda a, b: a + (b - a) / k, acc, stat)
        )

    # oracle: update_bn's cumulative average of per-batch mean / var; torch
    # BN tracks the UNBIASED (ddof=1 over the n=B*H*W reduced elements)
    # variance in running_var — models/common._TorchBN matches it exactly
    want_mean = np.mean([x.mean(axis=(0, 1, 2)) for x in batches], axis=0)
    want_var = np.mean(
        [x.reshape(-1, 3).var(axis=0, ddof=1) for x in batches], axis=0
    )
    np.testing.assert_allclose(
        np.asarray(acc["bn"]["bn"]["mean"]), want_mean, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(acc["bn"]["bn"]["var"]), want_var, rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow  # full tiny-model fit
def test_swa_fit_refreshes_batch_stats_under_averaged_params(tmp_path, monkeypatch):
    from objcavit_tpu.training.loop import Trainer
    from tests.test_train_loop import TINY

    cfg = yaml.safe_load(yaml.safe_dump(TINY))
    args = Config(cfg)
    args.paths.run_dir = str(tmp_path / "runs")
    args.optimizer.use_swa = True

    seen = {}
    orig = Trainer._refresh_swa_batch_stats

    def spy(self, state, loader, max_batches):
        seen["pre"] = jax.tree.map(np.asarray, state.batch_stats)
        out = orig(self, state, loader, max_batches)
        seen["post"] = jax.tree.map(np.asarray, out.batch_stats)
        return out

    monkeypatch.setattr(Trainer, "_refresh_swa_batch_stats", spy)
    trainer = Trainer(args)
    state, _metrics = trainer.fit()

    assert "post" in seen, "SWA finalisation must run the BN refresh"
    # the returned (and checkpointed) state carries the REFRESHED stats
    final = jax.tree.map(np.asarray, state.batch_stats)
    pre_l, post_l, fin_l = (
        jax.tree.leaves(seen["pre"]), jax.tree.leaves(seen["post"]),
        jax.tree.leaves(final),
    )
    for p, f in zip(post_l, fin_l):
        np.testing.assert_array_equal(p, f)
    # and they differ from the last training step's stale stats
    assert any(
        not np.allclose(a, b) for a, b in zip(pre_l, post_l)
    ), "refresh must change batch_stats"
    assert all(np.isfinite(x).all() for x in fin_l)
