"""Fused SE-gate + project + skip kernel vs the unfused op chain."""

import numpy as np

import jax
import jax.numpy as jnp

from objcavit_tpu.ops.se_project_pallas import se_gate_project, se_project_eligible

RNG = np.random.default_rng(23)


def _ref(dw, gate, kern, bias, skip):
    m, o = kern.shape
    gated = dw * gate[:, None, None, :].astype(dw.dtype)
    y = jax.lax.conv_general_dilated(
        gated, kern.reshape(1, 1, m, o).astype(dw.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(dw.dtype)
    return y + skip if skip is not None else y


def _case(b, h, w, m, o, with_skip, dtype):
    dw = jnp.asarray(RNG.standard_normal((b, h, w, m)), dtype)
    gate = jnp.asarray(RNG.uniform(0, 1, (b, m)).astype(np.float32))
    kern = jnp.asarray(0.1 * RNG.standard_normal((m, o)), dtype)
    bias = jnp.asarray(0.01 * RNG.standard_normal(o).astype(np.float32))
    skip = (
        jnp.asarray(RNG.standard_normal((b, h, w, o)), dtype)
        if with_skip else None
    )
    want = _ref(dw, gate, kern.astype(jnp.float32), bias, skip)
    got = se_gate_project(dw, gate, kern, bias, skip, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2 if dtype == jnp.bfloat16 else 1e-5,
        atol=3e-2 if dtype == jnp.bfloat16 else 1e-5,
    )


def test_se_gate_project_skip_f32():
    _case(2, 8, 16, 24, 24, True, jnp.float32)


def test_se_gate_project_noskip_f32():
    _case(2, 8, 16, 48, 16, False, jnp.float32)


def test_se_gate_project_bf16():
    _case(1, 8, 16, 144, 40, True, jnp.bfloat16)


def test_eligibility():
    assert se_project_eligible(240, 320, 144)
    assert se_project_eligible(15, 20, 2112)
    assert not se_project_eligible(7, 11, 4096 * 300)


def test_mbconv_epilogue_matches_unfused(monkeypatch):
    """Folded MBConv with the fused epilogue == the unfused op chain."""
    from objcavit_tpu.models.common import MBConv
    from objcavit_tpu.ops import se_project_pallas as sp

    m = MBConv(out_channels=16, expand_ratio=6, kernel_size=3, stride=1,
               fold_bn=True)
    x = jnp.asarray(RNG.standard_normal((2, 8, 16, 16)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x, train=False)
    want = m.apply(params, x, train=False)  # epilogue off (cpu, no interpret)
    monkeypatch.setattr(sp, "INTERPRET", True)
    got = m.apply(params, x, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_dws_epilogue_matches_unfused(monkeypatch):
    from objcavit_tpu.models.common import DepthwiseSeparable
    from objcavit_tpu.ops import se_project_pallas as sp

    m = DepthwiseSeparable(out_channels=16, kernel_size=3, stride=1,
                           fold_bn=True)
    x = jnp.asarray(RNG.standard_normal((2, 8, 16, 16)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(1), x, train=False)
    want = m.apply(params, x, train=False)
    monkeypatch.setattr(sp, "INTERPRET", True)
    got = m.apply(params, x, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
