"""Fused bins-expectation kernel vs XLA softmax+einsum (interpreter mode)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from objcavit_tpu.ops.pallas_bins import fused_bins_depth

RNG = np.random.default_rng(17)


def _ref(logits, centers):
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("nhwk,nk->nhw", p, centers)[..., None]


def test_fused_bins_depth_matches_softmax_einsum():
    b, h, w, k = 2, 8, 16, 32
    logits = jnp.asarray(RNG.standard_normal((b, h, w, k)).astype(np.float32))
    centers = jnp.asarray(
        np.sort(RNG.uniform(0.001, 10, (b, k))).astype(np.float32)
    )
    want = _ref(logits, centers)
    with pltpu.force_tpu_interpret_mode():
        got = fused_bins_depth(logits, centers)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_fused_bins_depth_grads_match():
    b, s, k = 1, 16, 32
    logits = jnp.asarray(RNG.standard_normal((b, 4, 4, k)).astype(np.float32))
    centers = jnp.asarray(
        np.sort(RNG.uniform(0.001, 10, (b, k))).astype(np.float32)
    )

    def loss_fused(l, c):
        return jnp.sum(fused_bins_depth(l, c) ** 2)

    def loss_ref(l, c):
        return jnp.sum(_ref(l, c) ** 2)

    want = jax.grad(loss_ref, argnums=(0, 1))(logits, centers)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_fused, argnums=(0, 1))(logits, centers)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-4,
                                   atol=1e-5)


def test_fused_conv_bins_depth_matches_unfused():
    """Inference fusion (1x1 conv inside the kernel) == conv + softmax path."""
    from objcavit_tpu.ops.pallas_bins import fused_conv_bins_depth

    rng = np.random.default_rng(1)
    b, h, w, c, k = 2, 8, 16, 32, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    kern = jnp.asarray(0.1 * rng.standard_normal((c, k)).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.standard_normal(k).astype(np.float32))
    centers = jnp.asarray(rng.uniform(0.1, 10, (b, k)).astype(np.float32))

    logits = jnp.einsum("bhwc,ck->bhwk", x, kern) + bias
    probs = jax.nn.softmax(logits, axis=-1)
    want = jnp.einsum("bhwk,bk->bhw", probs, centers)[..., None]

    with pltpu.force_tpu_interpret_mode():
        got = fused_conv_bins_depth(x, kern, bias, centers)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_fused_conv_bins_depth_batched_matches_unfactored_chain():
    """Factored bins head: feat @ (Q^T W) == (feat @ Q^T) @ W -> softmax
    expectation, the associative refold used by bins_head_depth_factored."""
    from objcavit_tpu.ops.pallas_bins import fused_conv_bins_depth_batched

    # h*w = 640 -> t = 128, nt = 5: exercises the multi-tile flat output
    # indexing (i*nt + j), not just the single-tile case
    b, h, w, c, kq, k = 2, 8, 80, 32, 16, 24
    feat = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
    queries = jnp.asarray(RNG.standard_normal((b, kq, c)).astype(np.float32))
    kern = jnp.asarray(
        (0.3 * RNG.standard_normal((kq, k))).astype(np.float32)
    )
    bias = jnp.asarray((0.1 * RNG.standard_normal(k)).astype(np.float32))
    centers = jnp.asarray(
        np.sort(RNG.uniform(0.001, 10, (b, k))).astype(np.float32)
    )

    range_maps = jnp.einsum("bhwc,bqc->bhwq", feat, queries)
    logits = jnp.einsum("bhwq,qk->bhwk", range_maps, kern) + bias
    want = _ref(logits, centers)

    m = jnp.einsum("bqc,qk->bck", queries, kern)
    with pltpu.force_tpu_interpret_mode():
        got = fused_conv_bins_depth_batched(feat, m, bias, centers)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )
