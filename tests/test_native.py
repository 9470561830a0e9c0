"""Native (C++) preprocessing core vs numpy reference implementations."""

import numpy as np
import pytest

from objcavit_tpu.data import native
from objcavit_tpu.data.preprocess import (
    _rotate_bilinear_np,
    _rotate_nearest_np,
    imagenet_normalize,
)

RNG = np.random.default_rng(13)


@pytest.fixture(scope="module")
def img():
    return RNG.uniform(0, 1, (48, 64, 3)).astype(np.float32)


def test_native_builds_and_loads():
    # the library should build from source in this image (g++ available)
    assert native.native_available()


def test_rotate_bilinear_matches_numpy(img):
    for angle in (-2.5, 0.0, 1.3):
        a = native.rotate_bilinear(img, angle)
        b = _rotate_bilinear_np(img, angle)
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_rotate_nearest_matches_numpy(img):
    a = native.rotate_nearest(img, -1.7)
    b = _rotate_nearest_np(img, -1.7)
    np.testing.assert_array_equal(a, b)


def test_augment_normalize_matches_numpy(img):
    c3 = RNG.uniform(0.9, 1.1, 3).astype(np.float32)
    got = native.augment_normalize(img, True, True, 1.05, 1.1, c3)
    want = imagenet_normalize(
        np.clip((img[:, ::-1] ** 1.05) * 1.1 * c3[None, None, :], 0, 1)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    # flip-only path (no augment)
    got = native.augment_normalize(img, True, False, 9.9, 9.9, c3)
    np.testing.assert_allclose(got, imagenet_normalize(img[:, ::-1]), atol=1e-5)


def test_hflip_roundtrip(img):
    np.testing.assert_array_equal(native.hflip(native.hflip(img)), img)
