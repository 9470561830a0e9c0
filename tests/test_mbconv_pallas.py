"""Fused Pallas MBConv head vs the unfused XLA composition (interpret mode).

Pins exact math of ops/mbconv_pallas.py::mbconv_expand_dw_pool — expand 1x1
+ SiLU + depthwise SAME + SiLU + global pool sum — against plain lax convs,
including the halo-band boundary zeroing and the pool accumulation across
row-band grid steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objcavit_tpu.ops.mbconv_pallas import (
    mbconv_eligible,
    mbconv_expand_dw_pool,
)

RNG = np.random.default_rng(3)


def _ref(x, we, be, wd, bd, k):
    h = jax.lax.conv_general_dilated(
        x, we[None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + be
    h = jax.nn.silu(h)
    h = jax.lax.conv_general_dilated(
        h, wd, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=h.shape[-1],
    ) + bd
    h = jax.nn.silu(h)
    return h, jnp.sum(h, axis=(1, 2))


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("shape", [(2, 8, 10, 6, 24), (1, 12, 16, 4, 16)])
def test_fused_mbconv_matches_unfused(k, shape):
    b, h, w, cin, m = shape
    assert mbconv_eligible(h, w, cin, m, k, 1)
    x = jnp.asarray(RNG.standard_normal((b, h, w, cin)).astype(np.float32))
    we = jnp.asarray(0.2 * RNG.standard_normal((cin, m)).astype(np.float32))
    be = jnp.asarray(0.3 * RNG.standard_normal((m,)).astype(np.float32))
    wd = jnp.asarray(0.2 * RNG.standard_normal((k, k, 1, m)).astype(np.float32))
    bd = jnp.asarray(0.3 * RNG.standard_normal((m,)).astype(np.float32))

    y_ref, pool_ref = _ref(x, we, be, wd, bd, k)
    y, pool = mbconv_expand_dw_pool(
        x, we, be, wd, bd, ksize=k, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pool), np.asarray(pool_ref),
                               atol=1e-3, rtol=1e-3)


def test_fused_mbconv_multi_tile_grid():
    """Shape that forces several row bands AND several M tiles."""
    b, h, w, cin, m, k = 1, 30, 8, 8, 32, 3
    x = jnp.asarray(RNG.standard_normal((b, h, w, cin)).astype(np.float32))
    we = jnp.asarray(0.2 * RNG.standard_normal((cin, m)).astype(np.float32))
    be = jnp.asarray(0.1 * RNG.standard_normal((m,)).astype(np.float32))
    wd = jnp.asarray(0.2 * RNG.standard_normal((k, k, 1, m)).astype(np.float32))
    bd = jnp.asarray(0.1 * RNG.standard_normal((m,)).astype(np.float32))
    y_ref, pool_ref = _ref(x, we, be, wd, bd, k)
    y, pool = mbconv_expand_dw_pool(x, we, be, wd, bd, ksize=3, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pool), np.asarray(pool_ref),
                               atol=1e-3, rtol=1e-3)


def test_encoder_wired_fused_head_matches_unfused():
    """fused_mbconv_head=True (interpret mode) == the plain folded encoder,
    with an IDENTICAL param tree (checkpoints/import unaffected)."""
    from objcavit_tpu.models import efficientnet as effmod
    from objcavit_tpu.ops import mbconv_pallas as mp
    from objcavit_tpu.utils.fold_bn import fold_batchnorm

    x = jnp.asarray(RNG.standard_normal((1, 32, 48, 3)).astype(np.float32))
    enc = effmod.EfficientNetEncoder("efficientnet-tiny")
    variables = enc.init(jax.random.PRNGKey(0), x)
    folded = fold_batchnorm(variables)

    plain = effmod.EfficientNetEncoder("efficientnet-tiny", fold_bn=True)
    fused = effmod.EfficientNetEncoder(
        "efficientnet-tiny", fold_bn=True, fused_mbconv_head=True
    )
    ref = plain.apply(folded, x, train=False)

    mp.INTERPRET = True
    try:
        vt = jax.tree.map(
            np.shape, fused.init(jax.random.PRNGKey(0), x, train=False)
        )
        vp = jax.tree.map(
            np.shape, plain.init(jax.random.PRNGKey(0), x, train=False)
        )
        assert vt == vp
        got = fused.apply(folded, x, train=False)
    finally:
        mp.INTERPRET = False

    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4
        )


def test_eligibility_rejects_stride_and_overflow():
    assert not mbconv_eligible(120, 160, 40, 240, 3, 2)  # stride
    assert not mbconv_eligible(480, 640, 40, 960, 5, 1)  # VMEM overflow
    # stage4: M=1056 has no 128-multiple tile that fits VMEM
    assert not mbconv_eligible(30, 40, 176, 1056, 5, 1)
    assert mbconv_eligible(120, 160, 40, 240, 3, 1)      # stage1 body
    assert mbconv_eligible(60, 80, 64, 384, 5, 1)        # stage2 body
