"""Regression pins for the round-4 advisor findings (ADVICE.md).

Each was a low-severity sharp edge; these tests keep them closed:
  * serving default capacity honours do_final_upscale (ADVICE #1),
  * fused_detect_head fails loudly on an impossible packed width (#2),
  * SWA BN refresh skips padded tail batches (#3, see also
    test_swa_bn_refresh.py),
  * class_max_head=True + det_topk raises instead of silently dropping the
    explicit request (#4),
  * StubObjectProvider counts scale with slot capacity (#5).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from objcavit_tpu.models import GraphBins


class _FakeFused:
    """Minimal stand-ins so pipeline __init__ logic runs without weights."""
    num_classes = 4


def test_default_capacity_honours_final_upscale():
    from objcavit_tpu.serving import DepthPipeline, _default_capacity

    assert _default_capacity((480, 640)) == 300
    assert _default_capacity((480, 640), do_final_upscale=True) == 1000
    assert _default_capacity((352, 1216)) == 418

    # the pipeline derives it from the model, not an assumption of half-res
    for fu, want in ((False, 300), (True, 1000)):
        model = GraphBins(
            encoder_name="efficientnet-tiny", do_final_upscale=fu,
            dims_test=(480, 640),
        )
        pipe = DepthPipeline(model, {}, eval_dims=(480, 640), use_mesh=False)
        assert pipe.n_obj_max == want, (fu, pipe.n_obj_max)


def test_class_max_head_conflicts_with_det_topk():
    from objcavit_tpu.serving import FusedDepthPipeline

    model = GraphBins(encoder_name="efficientnet-tiny")
    table = np.zeros((5, 512), np.float32)
    with pytest.raises(ValueError, match="class_max_head"):
        FusedDepthPipeline(
            model, {}, _FakeFused(), {}, table, eval_dims=(64, 96),
            n_obj_max=4, det_topk=16, class_max_head=True, use_mesh=False,
        )
    # either knob alone constructs fine
    FusedDepthPipeline(
        model, {}, _FakeFused(), {}, table, eval_dims=(64, 96),
        n_obj_max=4, det_topk=16, use_mesh=False,
    )
    FusedDepthPipeline(
        model, {}, _FakeFused(), {}, table, eval_dims=(64, 96),
        n_obj_max=4, class_max_head=True, use_mesh=False,
    )


def test_fused_detect_head_rejects_oversized_packing():
    from objcavit_tpu.ops.detect_head_pallas import fused_detect_head

    flat = jnp.zeros((1, 8, 16), jnp.float32)
    nm_max = (128 - 15) // 3  # 5*na + nm*na <= 128, na=3
    kernel = jnp.zeros((16, 3 * (5 + 4 + nm_max + 1)), jnp.float32)
    bias = jnp.zeros((3 * (5 + 4 + nm_max + 1),), jnp.float32)
    with pytest.raises(AssertionError, match="128-wide"):
        fused_detect_head(flat, kernel, bias, num_classes=4, nm=nm_max + 1)


def test_stub_provider_scales_with_capacity():
    from objcavit_tpu.training.providers import StubObjectProvider

    imgs = np.zeros((64, 64, 96, 3), np.float32)
    # capacity 300: counts must be able to exceed the old hard cap of 32
    p = StubObjectProvider(n_max=300, seed=0)
    out = p(imgs)
    counts = out["valid"].sum(axis=1)
    assert counts.max() > 32, counts.max()
    assert counts.max() < 300
    # tiny capacity still respected
    p4 = StubObjectProvider(n_max=4, seed=0)
    assert p4(imgs[:8])["valid"].sum(axis=1).max() <= 4
