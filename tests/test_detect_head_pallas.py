"""Fused detect-head kernel (1x1 conv + per-anchor class max/argmax) vs the
dense head, interpreter mode (ops/detect_head_pallas.py).

The kernel is the EXACT replacement for the r3 sparse-head serving
relaxation: identical math to the dense path up to matmul accumulation
order. Pinned here: numeric agreement with the dense computation, argmax
first-max tie-breaking, pad-class exclusion, position padding, and the
decode_best_classmax composition against decode_best.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from objcavit_tpu.ops.detect_head_pallas import (
    fused_detect_head,
    fused_detect_head_reference,
)

RNG = np.random.default_rng(41)


def _case(b, s, cin, nc, nm=8, dtype=jnp.float32, tie_rows=()):
    no = 5 + nc + nm
    flat = (RNG.standard_normal((b, s, cin)) * 0.3).astype(np.float32)
    kernel = (RNG.standard_normal((cin, 3 * no)) * 0.1).astype(np.float32)
    bias = (RNG.standard_normal(3 * no) * 0.1).astype(np.float32)
    flat = jnp.asarray(flat, dtype)
    return flat, jnp.asarray(kernel), jnp.asarray(bias)


@pytest.mark.parametrize("s,cin,nc", [(256, 128, 200), (300, 256, 1203)])
def test_fused_head_matches_dense(s, cin, nc):
    b, nm = 2, 8
    flat, kernel, bias = _case(b, s, cin, nc, nm)
    with pltpu.force_tpu_interpret_mode():
        y5, coef, cmax, carg = fused_detect_head(flat, kernel, bias, nc, nm)
    ry5, rcoef, rcmax, rcarg = fused_detect_head_reference(
        flat, kernel, bias, nc, nm
    )
    np.testing.assert_allclose(np.asarray(y5), np.asarray(ry5),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(coef), np.asarray(rcoef),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cmax), np.asarray(rcmax),
                               rtol=1e-5, atol=1e-5)
    # argmax may only differ where two logits are fp-equal-distance; with
    # random continuous weights that never happens
    np.testing.assert_array_equal(np.asarray(carg), np.asarray(rcarg))


def test_fused_head_pads_positions_and_excludes_pad_classes():
    """S not a multiple of the 256 tile; nc not a multiple of 128. Pad rows
    are dropped and pad classes can never win the max."""
    b, s, cin, nc, nm = 1, 100, 64, 130, 4
    flat, kernel, bias = _case(b, s, cin, nc, nm)
    with pltpu.force_tpu_interpret_mode():
        y5, coef, cmax, carg = fused_detect_head(flat, kernel, bias, nc, nm)
    assert y5.shape == (b, s, 3, 5)
    assert coef.shape == (b, s, 3, nm)
    assert int(np.asarray(carg).max()) < nc
    ry5, rcoef, rcmax, rcarg = fused_detect_head_reference(
        flat, kernel, bias, nc, nm
    )
    np.testing.assert_allclose(np.asarray(cmax), np.asarray(rcmax),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(carg), np.asarray(rcarg))


def test_fused_head_argmax_breaks_ties_first():
    """Duplicate class columns -> fp-equal logits; argmax must pick the
    FIRST (jnp.argmax semantics), including across lane-tile boundaries."""
    b, s, cin, nc, nm = 1, 8, 16, 260, 2
    no = 5 + nc + nm
    kernel = np.zeros((cin, 3 * no), np.float32)
    bias = np.zeros(3 * no, np.float32)
    col = RNG.standard_normal(cin).astype(np.float32)
    for a in range(3):
        # classes 3 and 200 share identical weights -> identical logits
        kernel[:, a * no + 5 + 3] = col
        kernel[:, a * no + 5 + 200] = col
    flat = jnp.asarray(np.abs(RNG.standard_normal((b, s, cin))) + 0.5,
                       jnp.float32) * jnp.sign(jnp.asarray(col))[None, None]
    with pltpu.force_tpu_interpret_mode():
        _, _, cmax, carg = fused_detect_head(
            flat, jnp.asarray(kernel), jnp.asarray(bias), nc, nm
        )
    _, _, rcmax, rcarg = fused_detect_head_reference(
        flat, jnp.asarray(kernel), jnp.asarray(bias), nc, nm
    )
    np.testing.assert_array_equal(np.asarray(carg), np.asarray(rcarg))
    # the winning logit is strictly positive, so the tie is real: class 3
    assert (np.asarray(cmax) > 0).all()
    assert (np.asarray(carg) == 3).all()


@pytest.mark.slow  # full detector trace
def test_class_max_path_matches_dense_end_to_end():
    """Yolov7Seg(class_max=True) + decode_best_classmax == dense head +
    decode_best, through the real detector at a stride-32 resolution."""
    from objcavit_tpu.models.yolov7 import (
        Yolov7Seg,
        decode_best,
        decode_best_classmax,
    )

    nc = 37
    model = Yolov7Seg(num_classes=nc)
    img = jnp.asarray(RNG.uniform(0, 1, (1, 96, 128, 3)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    dense, _ = model.apply(variables, img, train=False)
    want = decode_best(dense, nc)
    cm, _ = model.apply(variables, img, train=False, class_max=True)
    got = decode_best_classmax(cm, nc)
    for g, w, tol in zip(got, want, (1e-4, 1e-5, 0, 1e-4)):
        if tol == 0:
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        else:
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-4, atol=tol
            )
