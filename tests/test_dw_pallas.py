"""Fused Pallas depthwise conv (ops/dw_pallas.py) vs the lax reference path.

The kernel is a measured-negative experiment (0.36-0.45x XLA's depthwise
emitter on chip — see its module docstring and docs/PERF.md); it is not wired
into any model. These tests pin its numerics against the
lax.conv_general_dilated + bias + SiLU (+ global mean pool) chain so the
experiment stays honest if revisited. Runs in Pallas interpreter mode so it
works on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objcavit_tpu.ops.dw_pallas import _pick_cb, dw_conv_silu_pool


def _ref(x, w, b):
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    y = jax.nn.silu(y + b)
    return y, jnp.sum(y.astype(jnp.float32), axis=(1, 2))


@pytest.mark.parametrize(
    "shape,ksize",
    [
        ((2, 10, 12, 128), 3),  # one full lane tile
        ((2, 8, 10, 256), 5),   # multi-tile channels
        ((1, 6, 8, 160), 3),    # partial last channel tile (160 = 128 + 32)
    ],
)
def test_matches_lax_dw_conv(shape, ksize):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((ksize, ksize, 1, shape[-1])), jnp.float32)
    b = jnp.asarray(rng.standard_normal((shape[-1],)), jnp.float32)
    y, pool = dw_conv_silu_pool(x, w, b, ksize=ksize, interpret=True)
    y_ref, pool_ref = _ref(x, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(pool), np.asarray(pool_ref), rtol=2e-4, atol=2e-3
    )


def test_no_pool_variant():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 1, 128)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
    y, pool = dw_conv_silu_pool(x, w, b, ksize=3, with_pool=False, interpret=True)
    assert pool is None
    y_ref, _ = _ref(x, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-5)


def test_bf16_input_dtype_preserved():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 128)), jnp.float32).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 1, 128)), jnp.float32).astype(jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
    y, pool = dw_conv_silu_pool(x, w, b, ksize=3, interpret=True)
    assert y.dtype == jnp.bfloat16 and pool.dtype == jnp.float32
    y_ref, pool_ref = _ref(x, w, b.astype(jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32), rtol=0.05, atol=0.05
    )


def test_channel_tile_picker_fits_vmem():
    for c, h, w, k in [(768, 30, 40, 3), (1056, 30, 40, 5), (3072, 15, 20, 3)]:
        cb = _pick_cb(c, h, w, k)
        assert cb % 128 == 0
        vmem = 4 * h * w * cb * 2 + (h + k - 1) * (w + k - 1) * cb * 2 + h * w * cb * 4
        assert vmem <= 12 * 1024 * 1024
