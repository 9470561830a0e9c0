"""One-pass Pallas bilinear resize vs the einsum reference (interpret mode).

Pins ops/resize_pallas.py::resize_bilinear_pallas — slab DMA offsets, SMEM
tap tables, per-row lerp + W-matmul — against ops/resize.py::resize_bilinear
(torch align_corners=True semantics) at the decoder up-stage geometries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objcavit_tpu.ops.resize import resize_bilinear
from objcavit_tpu.ops.resize_pallas import resize_bilinear_pallas, resize_eligible

RNG = np.random.default_rng(5)


@pytest.mark.parametrize(
    "shape",
    [
        (2, 8, 16, 128, 16, 32),    # clean 2x
        (1, 15, 16, 128, 30, 40),   # up2-like non-integer W ratio
        (2, 6, 8, 256, 14, 21),     # awkward ratios, several bands
        (1, 17, 22, 128, 30, 40),   # up1-like: W zero-padded to tiling
    ],
)
def test_pallas_resize_matches_einsum(shape):
    b, hi, wi, c, ho, wo = shape
    assert resize_eligible(hi, wi, c, ho, wo)
    x = jnp.asarray(RNG.standard_normal((b, hi, wi, c)).astype(np.float32))
    ref = resize_bilinear(x, ho, wo, align_corners=True)
    got = resize_bilinear_pallas(x, ho, wo, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_decoder_wired_pallas_resize_matches_einsum_path():
    """UpSampleWithSkip (bf16 fast path) with the Pallas resize == the
    einsum resize, same params — the gate changes no numerics beyond the
    bf16 rounding both paths already accept."""
    from objcavit_tpu.models.decoder import UpSampleWithSkip
    from objcavit_tpu.ops import resize_pallas as rp

    x = jnp.asarray(
        RNG.standard_normal((1, 8, 16, 128)).astype(np.float32), jnp.bfloat16
    )
    skip = jnp.asarray(
        RNG.standard_normal((1, 16, 32, 24)).astype(np.float32), jnp.bfloat16
    )
    m = UpSampleWithSkip(64, fold_bn=True, dtype=jnp.bfloat16)
    variables = m.init(jax.random.PRNGKey(0), x, skip, False)

    assert rp.resize_eligible(8, 16, 128, 16, 32)
    rp.INTERPRET = True
    try:
        got = m.apply(variables, x, skip, False)
    finally:
        rp.INTERPRET = False
    ref = m.apply(variables, x, skip, False)  # CPU backend -> einsum path
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05,
    )


def test_eligibility_gates_alignment_and_direction():
    assert resize_eligible(120, 160, 256, 240, 320)   # up4
    assert resize_eligible(60, 80, 512, 120, 160)     # up3
    assert resize_eligible(30, 40, 1024, 60, 80)      # up2
    assert resize_eligible(17, 22, 2048, 30, 40)     # up1 (W zero-padded)
    assert not resize_eligible(240, 320, 256, 120, 160)  # downscale
    assert not resize_eligible(120, 160, 40, 240, 320)   # c % 128 != 0
