"""Pallas fused attention vs the XLA reference path (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from objcavit_tpu.ops.attention import mha_core

RNG = np.random.default_rng(5)


def _rand(shape):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("with_mask", [False, True])
def test_pallas_mha_matches_xla(with_mask):
    b, sq, sk, h, d = 2, 24, 16, 4, 32
    q, k, v = _rand((b, sq, h, d)), _rand((b, sk, h, d)), _rand((b, sk, h, d))
    mask = None
    if with_mask:
        m = np.zeros((b, sk), bool)
        m[0, 10:] = True
        m[1, 5:] = True
        mask = jnp.asarray(m)
    want = mha_core(q, k, v, mask, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = mha_core(q, k, v, mask, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_pallas_mha_grads_match_xla():
    b, s, h, d = 1, 16, 2, 32
    q, k, v = _rand((b, s, h, d)), _rand((b, s, h, d)), _rand((b, s, h, d))
    m = np.zeros((b, s), bool)
    m[0, 12:] = True
    mask = jnp.asarray(m)

    def loss_xla(q, k, v):
        return jnp.sum(mha_core(q, k, v, mask, impl="xla") ** 2)

    def loss_pallas(q, k, v):
        return jnp.sum(mha_core(q, k, v, mask, impl="pallas") ** 2)

    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-3, atol=1e-4)
