"""Annotator sanity tests."""

import numpy as np

from objcavit_tpu.utils.annotate import annotate_image


def test_annotate_draws_boxes_and_masks():
    img = np.zeros((40, 60, 3), np.float32)
    xywh = np.array([[30, 20, 20, 10], [-1, -1, -1, -1]], np.float32)
    classes = np.array([3, 0])
    valid = np.array([True, False])
    masks = np.zeros((2, 40, 60), np.float32)
    masks[0, 18:22, 25:35] = 1.0
    out = annotate_image(img, xywh, classes, valid, masks)
    assert out.shape == img.shape
    assert out.max() <= 1.0 and out.min() >= 0.0
    # box edges painted
    assert out[15, 30].sum() > 0  # top edge y = 20-10/2 = 15
    # mask region tinted
    assert out[20, 30].sum() > 0
    # invalid detection drew nothing at its (clipped) sentinel location
    img2 = annotate_image(img, xywh, classes, np.array([False, False]), masks)
    assert img2.sum() == 0
