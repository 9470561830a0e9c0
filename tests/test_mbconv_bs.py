"""Batch-in-sublanes fused MBConv head vs the unfused XLA composition.

Pins exact math of ops/mbconv_bs.py::mbconv_bs_expand_dw_pool — expand 1x1
+ SiLU + depthwise SAME + SiLU + global pool sum, in (H, W, B, C) layout —
against plain lax convs in NHWC, including the halo-ring zeroing and the
pool accumulation across the h/w grid steps (interpret mode on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objcavit_tpu.ops.mbconv_bs import (
    mbconv_bs_eligible,
    mbconv_bs_expand_dw_pool,
)

RNG = np.random.default_rng(7)


def _ref(x, we, be, wd, bd):
    """NHWC reference: expand 1x1 + SiLU + depthwise SAME + SiLU + pool."""
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


def _run(b, h, w, cin, m, k):
    x = jnp.asarray(RNG.standard_normal((b, h, w, cin)).astype(np.float32))
    we = jnp.asarray(0.2 * RNG.standard_normal((cin, m)).astype(np.float32))
    be = jnp.asarray(0.3 * RNG.standard_normal((m,)).astype(np.float32))
    wd = jnp.asarray(0.2 * RNG.standard_normal((k, k, 1, m)).astype(np.float32))
    bd = jnp.asarray(0.3 * RNG.standard_normal((m,)).astype(np.float32))
    y_ref, pool_ref = _ref(x, we, be, wd, bd)

    x_t = jnp.transpose(x, (1, 2, 0, 3))  # (H, W, B, Cin)
    y_t, pool = mbconv_bs_expand_dw_pool(
        x_t, we, be, wd, bd, ksize=k, interpret=True
    )
    y = jnp.transpose(y_t, (2, 0, 1, 3))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pool), np.asarray(pool_ref),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("shape", [(8, 8, 10, 6, 24), (16, 12, 16, 4, 16)])
def test_fused_bs_matches_unfused(k, shape):
    b, h, w, cin, m = shape
    assert mbconv_bs_eligible(h, w, b, cin, m, k, 1)
    _run(b, h, w, cin, m, k)


def test_fused_bs_multi_tile_grid():
    """Shape that forces several h/w bands AND several M tiles."""
    # m=256 splits into 128-wide lane tiles; h=30/w=16 force band tiling
    _run(8, 30, 16, 8, 256, 3)


def test_fused_bs_batch_tiles():
    """B=32 with Bt=16 exercises the batch grid dimension."""
    _run(32, 10, 12, 6, 24, 3)


def test_eligibility_rules():
    assert not mbconv_bs_eligible(120, 160, 96, 40, 240, 3, 2)  # stride
    assert not mbconv_bs_eligible(8, 10, 6, 6, 24, 3, 1)        # B not 8-mult
    # flagship serving shapes (bs=96 and bs=128): stages 1/2/3/6 have plans;
    # the k=5 stages at 30x40 / 15x20 (4/5) exceed VMEM under the k5 halo
    for b in (96, 128):
        assert mbconv_bs_eligible(120, 160, b, 40, 240, 3, 1)       # stage1
        assert mbconv_bs_eligible(60, 80, b, 64, 384, 5, 1)         # stage2
        assert mbconv_bs_eligible(30, 40, b, 128, 768, 3, 1)        # stage3
        assert mbconv_bs_eligible(15, 20, b, 512, 3072, 3, 1)       # stage6
        assert not mbconv_bs_eligible(30, 40, b, 176, 1056, 5, 1)   # stage4
        assert not mbconv_bs_eligible(15, 20, b, 304, 1824, 5, 1)   # stage5
