"""YOLOv7-seg architecture + fixed-shape NMS tests (tiny inputs, CPU)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from objcavit_tpu.models.yolov7 import (
    Yolov7Seg,
    decode_predictions,
)
from objcavit_tpu.ops.nms import batched_nms, xywh_to_xyxy, xyxy_to_xywh


pytestmark = pytest.mark.slow  # full-model jit compile

RNG = np.random.default_rng(7)


def test_nms_suppresses_overlaps_and_respects_classes():
    # 4 boxes: two heavy overlaps (same class), one far away, one overlapping
    # but different class
    xywh = np.array(
        [
            [[50, 50, 40, 40], [52, 52, 40, 40], [200, 200, 30, 30], [50, 50, 38, 38]]
        ],
        np.float32,
    )
    scores = np.array([[0.9, 0.8, 0.7, 0.85]], np.float32)
    classes = np.array([[1, 1, 2, 3]], np.int32)
    out = batched_nms(
        xywh_to_xyxy(jnp.asarray(xywh)), jnp.asarray(scores),
        jnp.asarray(classes), conf_thres=0.25, iou_thres=0.45,
        pre_topk=4, max_det=4, agnostic=False,
    )
    valid = np.asarray(out["valid"][0])
    kept_cls = np.asarray(out["classes"][0])[valid]
    # box1 suppressed by box0 (same class, IoU>0.45); box3 kept (class 3)
    assert valid.sum() == 3
    assert set(kept_cls.tolist()) == {1, 2, 3}

    # agnostic: the class-3 box is suppressed too
    out2 = batched_nms(
        xywh_to_xyxy(jnp.asarray(xywh)), jnp.asarray(scores),
        jnp.asarray(classes), conf_thres=0.25, iou_thres=0.45,
        pre_topk=4, max_det=4, agnostic=True,
    )
    assert np.asarray(out2["valid"][0]).sum() == 2


def test_nms_conf_threshold_and_padding():
    xywh = np.array([[[50, 50, 40, 40], [200, 200, 30, 30]]], np.float32)
    scores = np.array([[0.9, 0.1]], np.float32)
    classes = np.zeros((1, 2), np.int32)
    out = batched_nms(
        xywh_to_xyxy(jnp.asarray(xywh)), jnp.asarray(scores),
        jnp.asarray(classes), conf_thres=0.25, iou_thres=0.45,
        pre_topk=2, max_det=4, agnostic=False,
    )
    valid = np.asarray(out["valid"][0])
    assert valid.tolist() == [True, False, False, False]
    assert np.asarray(out["scores"][0])[1:].sum() == 0  # padded scores zeroed


def test_xywh_xyxy_roundtrip():
    xywh = jnp.asarray(RNG.uniform(10, 100, (3, 7, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(xyxy_to_xywh(xywh_to_xyxy(xywh))), np.asarray(xywh),
        rtol=1e-5, atol=1e-4,
    )


def test_yolov7seg_forward_shapes_and_decode():
    nc, nm = 4, 8
    model = Yolov7Seg(num_classes=nc, nm=nm)
    img = jnp.asarray(RNG.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    (preds, proto), _ = model.init_with_output(jax.random.PRNGKey(0), img)
    # three levels at /8, /16, /32 with 3 anchors x (5+nc+nm)
    assert preds[0].shape == (1, 8, 8, 3, 5 + nc + nm)
    assert preds[1].shape == (1, 4, 4, 3, 5 + nc + nm)
    assert preds[2].shape == (1, 2, 2, 3, 5 + nc + nm)
    assert proto.shape == (1, 16, 16, nm)  # /4 prototypes

    boxes, obj, cls, coef = decode_predictions(preds, nc, nm)
    a = 3 * (64 + 16 + 4)
    assert boxes.shape == (1, a, 4)
    assert obj.shape == (1, a)
    assert cls.shape == (1, a, nc)
    assert coef.shape == (1, a, nm)
    # decoded centres live inside the image + one anchor cell margin
    b = np.asarray(boxes)
    assert (b[..., :2] > -16).all() and (b[..., :2] < 64 + 16).all()


def test_process_masks_crops_and_upsamples():
    from objcavit_tpu.ops.masks import process_masks

    hp, wp, nm = 8, 12, 4
    proto = jnp.asarray(RNG.standard_normal((hp, wp, nm)).astype(np.float32))
    coeffs = jnp.asarray(RNG.standard_normal((2, nm)).astype(np.float32) * 3)
    # box 0 covers the left half; box 1 is an invalid slot
    boxes = jnp.asarray(np.array([[0, 0, 48, 64], [0, 0, 96, 64]], np.float32))
    valid = jnp.asarray(np.array([True, False]))
    masks = np.asarray(process_masks(proto, coeffs, boxes, valid, (64, 96)))
    assert masks.shape == (2, 64, 96)
    assert (masks >= 0).all() and (masks <= 1).all()
    # outside box 0 (right half) the mask must be ~0 (bilinear edge bleed only)
    assert masks[0, :, 56:].max() < 0.6
    assert masks[0, :, :40].max() > 0.5  # something survives inside
    # invalid slot produces an all-zero mask
    assert masks[1].max() == 0.0


def test_decode_best_matches_full_decode():
    """decode_best (reduce-in-decode, no (B,A,nc) materialisation) must equal
    max/argmax over decode_predictions' obj*cls confidences."""
    import jax.numpy as jnp

    from objcavit_tpu.models.yolov7 import decode_best, decode_predictions

    rng = np.random.default_rng(5)
    nc, nm = 11, 4
    no = 5 + nc + nm
    preds = [
        jnp.asarray(rng.standard_normal((2, h, w, 3, no)).astype(np.float32))
        for h, w in ((8, 12), (4, 6), (2, 3))
    ]
    boxes, obj, cls, coef = decode_predictions(preds, nc, nm)
    conf = obj[..., None] * cls
    b2, best, best_cls, coef2 = decode_best(preds, nc, nm)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(boxes), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(best), np.asarray(jnp.max(conf, -1)), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(best_cls), np.asarray(jnp.argmax(conf, -1))
    )
    np.testing.assert_array_equal(np.asarray(coef2), np.asarray(coef))


def test_sparse_topk_head_full_k_matches_dense_path():
    """topk_positions with k = h*w (all positions selected) must reproduce
    the dense head + decode_best + NMS results exactly — only the candidate
    ORDER differs, which the score-sorted NMS output normalises away."""
    from objcavit_tpu.models.yolov7 import decode_best, decode_best_sparse

    nc, nm = 4, 8
    model = Yolov7Seg(num_classes=nc, nm=nm)
    img = jnp.asarray(RNG.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(3), img)

    dense_preds, _ = model.apply(variables, img, train=False)
    # decode_best uses sigmoid(max logit) — bit-identical to the sparse
    # path's formula (max-of-sigmoids differs by an ulp and flips near-ties)
    d_boxes, d_score, d_clsid, _ = decode_best(dense_preds, nc, nm=nm)

    sparse_preds, _ = model.apply(
        variables, img, train=False, topk_positions=64
    )
    s_boxes, s_score, s_clsid, s_coef = decode_best_sparse(sparse_preds, nc, nm=nm)
    assert s_boxes.shape[1] == d_boxes.shape[1]  # all positions selected

    d_full = decode_best(dense_preds, nc, nm=nm)
    # the sparse path reorders candidates (objectness-sorted) and computes
    # the head as a sliced-kernel matmul whose reduction tiling differs from
    # the dense conv by ulps — the exactness contract is SET equality of
    # (box, score, class, coefs) rows at fp tolerance. (NMS output equality
    # doesn't hold under reordering here only because random-init tiny convs
    # produce dozens of exactly-tied scores whose tie-break order differs.)
    for b in range(img.shape[0]):
        dd = np.concatenate(
            [np.asarray(d_boxes)[b], np.asarray(d_score)[b][:, None],
             np.asarray(d_full[2])[b][:, None].astype(np.float32),
             np.asarray(d_full[3])[b]], axis=1,
        )
        ss = np.concatenate(
            [np.asarray(s_boxes)[b], np.asarray(s_score)[b][:, None],
             np.asarray(s_clsid)[b][:, None].astype(np.float32),
             np.asarray(s_coef)[b]], axis=1,
        )
        # nearest-row matching in both directions (N=252: O(N^2) is fine)
        for a_rows, b_rows, tag in ((dd, ss, "dense->sparse"),
                                    (ss, dd, "sparse->dense")):
            dists = np.abs(a_rows[:, None, :] - b_rows[None, :, :]).max(-1)
            worst = dists.min(axis=1).max()
            assert worst < 1e-3, f"{tag}: unmatched row, dist {worst}"


def test_detect_head_random_init_matches_nn_conv_convention():
    """The ConvParams detect head must keep flax nn.Conv's init (zero bias ->
    sigmoid(0)=0.5 objectness baseline at random init), not the torch
    kaiming-uniform used for imported-weight heads — random-init benches and
    NMS candidate statistics depend on it."""
    model = Yolov7Seg(num_classes=4, nm=8)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    params = variables["params"]
    for i in range(3):
        bias = np.asarray(params[f"detect{i}"]["bias"])
        np.testing.assert_array_equal(bias, np.zeros_like(bias))
        kernel = np.asarray(params[f"detect{i}"]["kernel"], np.float64)
        fan_in = kernel.shape[0] * kernel.shape[1] * kernel.shape[2]
        # lecun_normal: std ~= sqrt(1/fan_in) (truncated); kaiming-uniform
        # would be uniform with std sqrt(1/(3*fan_in)) — distinguishable
        assert abs(kernel.std() * np.sqrt(fan_in) - 0.88) < 0.15
