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


def test_assemble_batch_matches_per_sample():
    """Native threaded batch assembly == serial crop+augment+stack, bitwise."""
    rng = np.random.default_rng(7)
    n, H, W, h, w = 5, 40, 60, 24, 32
    images = [rng.uniform(0, 1, (H, W, 3)).astype(np.float32) for _ in range(n)]
    depths = [rng.uniform(0, 9, (H, W, 1)).astype(np.float32) for _ in range(n)]
    crops = np.stack(
        [rng.integers(0, (H - h + 1, W - w + 1), 2) for _ in range(n)]
    ).astype(np.int32)
    flips = rng.uniform(size=n) > 0.5
    do_augs = rng.uniform(size=n) > 0.5
    gammas = rng.uniform(0.9, 1.1, n).astype(np.float32)
    brights = rng.uniform(0.75, 1.25, n).astype(np.float32)
    colors = rng.uniform(0.9, 1.1, (n, 3)).astype(np.float32)

    got_i, got_d = native.assemble_batch(
        images, depths, crops, flips, do_augs, gammas, brights, colors, h, w,
        n_threads=3,
    )

    want_i, want_d = [], []
    for i in range(n):
        y, x = int(crops[i, 0]), int(crops[i, 1])
        img = native.augment_normalize(
            images[i][y : y + h, x : x + w], bool(flips[i]), bool(do_augs[i]),
            float(gammas[i]), float(brights[i]), colors[i],
        )
        dep = depths[i][y : y + h, x : x + w]
        if flips[i]:
            dep = dep[:, ::-1]
        want_i.append(img)
        want_d.append(dep)
    np.testing.assert_array_equal(got_i, np.stack(want_i))
    np.testing.assert_array_equal(got_d, np.stack(want_d))


def test_get_batch_bitwise_matches_serial_get(tmp_path):
    """DepthDataset.get_batch (native batch path) == repeated .get with the
    same RNG stream — same pixels, same order of random draws."""
    from PIL import Image

    import yaml

    from objcavit_tpu.config import Config
    from objcavit_tpu.data.dataset import DepthDataset

    rng = np.random.default_rng(3)
    img_dir = tmp_path / "nyu" / "sync"
    img_dir.mkdir(parents=True)
    lines = []
    for i in range(4):
        img = (rng.uniform(0, 255, (80, 100, 3))).astype(np.uint8)
        dep = (rng.uniform(500, 9000, (80, 100))).astype(np.int32)
        Image.fromarray(img).save(img_dir / f"im{i}.png")
        Image.fromarray(dep, mode="I").save(img_dir / f"dep{i}.png")
        lines.append(f"im{i}.png dep{i}.png 518.8")
    split = tmp_path / "train.txt"
    split.write_text("\n".join(lines))

    args = Config({
        "basic": {"dataset": "nyu", "use_adabins_dataloader": True},
        "paths": {"data_dir": str(tmp_path)},
        "nyu": {
            "filenames_file_train": str(split), "filenames_file_eval": str(split),
            "base_path": "nyu", "train_path": "sync", "eval_path": "sync",
            "image_norm_factor": 255.0, "depth_norm_factor": 1000.0,
            "min_depth": 0.001, "max_depth": 10, "do_kb_crop": False,
            "do_random_rotate": True, "degree": 2.5,
            "dimensions_train": [32, 48], "dimensions_test": [32, 48],
        },
    })
    ds = DepthDataset(args, "train")
    # patch out the NYU blank-boundary crop dependency on full-size images:
    # our tiny images are smaller than the (45,43,427,565) crop box, so use
    # kitti-style passthrough by renaming the dataset
    ds.dataset = "kitti"

    idxs = [0, 1, 2, 3]
    got = ds.get_batch(idxs, np.random.default_rng(11))
    assert got is not None, "native batch path unavailable"
    batch, meta = got

    rs = np.random.default_rng(11)
    want_imgs, want_deps = [], []
    for i in idxs:
        s = ds.get(i, rs)
        want_imgs.append(s["image"])
        want_deps.append(s["depth"])
    np.testing.assert_array_equal(batch["image"], np.stack(want_imgs))
    np.testing.assert_array_equal(batch["depth"], np.stack(want_deps))
    assert meta["focal"] == [518.8] * 4


def _disk_nyu(tmp_path, hw=(480, 640), n=4, train_dims=(32, 48)):
    from PIL import Image

    from objcavit_tpu.config import Config

    rng = np.random.default_rng(3)
    img_dir = tmp_path / "nyu" / "sync"
    img_dir.mkdir(parents=True)
    lines = []
    for i in range(n):
        img = (rng.uniform(0, 255, (*hw, 3))).astype(np.uint8)
        dep = (rng.uniform(500, 9000, hw)).astype(np.int32)
        Image.fromarray(img).save(img_dir / f"im{i}.png")
        Image.fromarray(dep, mode="I").save(img_dir / f"dep{i}.png")
        lines.append(f"im{i}.png dep{i}.png 518.8")
    split = tmp_path / "train.txt"
    split.write_text("\n".join(lines))
    return Config({
        "basic": {"dataset": "nyu", "use_adabins_dataloader": True},
        "paths": {"data_dir": str(tmp_path)},
        "nyu": {
            "filenames_file_train": str(split), "filenames_file_eval": str(split),
            "base_path": "nyu", "train_path": "sync", "eval_path": "sync",
            "image_norm_factor": 255.0, "depth_norm_factor": 1000.0,
            "min_depth": 0.001, "max_depth": 10, "do_kb_crop": False,
            "do_random_rotate": True, "degree": 2.5,
            "dimensions_train": list(train_dims),
            "dimensions_test": list(train_dims),
        },
    })


def test_parallel_decode_batch_bitwise_matches_serial_get(tmp_path):
    """get_batch's thread-pool decode path (standard 480x640 NYU sources ->
    static post-crop shape) must be bit-identical to repeated .get with the
    same RNG stream: the serial RNG pass replays the per-sample draw order
    (paths -> rotate angle -> stage-B aug) exactly."""
    from objcavit_tpu.data.dataset import DepthDataset

    ds = DepthDataset(_disk_nyu(tmp_path), "train")
    ds.decode_threads = 4  # force the parallel branch on 1-core hosts

    idxs = [0, 1, 2, 3, 1]
    got = ds.get_batch(idxs, np.random.default_rng(11))
    assert got is not None, "native batch path unavailable"
    batch, meta = got

    rs = np.random.default_rng(11)
    want_imgs, want_deps = [], []
    for i in idxs:
        s = ds.get(i, rs)
        want_imgs.append(s["image"])
        want_deps.append(s["depth"])
    np.testing.assert_array_equal(batch["image"], np.stack(want_imgs))
    np.testing.assert_array_equal(batch["depth"], np.stack(want_deps))
    assert meta["focal"] == [518.8] * 5


def test_parallel_decode_rejects_nonstandard_resolution(tmp_path):
    """The parallel branch draws stage-B crops assuming the standard source
    resolution; a smaller source must fail loudly, not crop wrongly."""
    import pytest

    from objcavit_tpu.data.dataset import DepthDataset

    ds = DepthDataset(_disk_nyu(tmp_path, hw=(120, 160), train_dims=(16, 24)),
                      "train")
    ds.decode_threads = 4
    with pytest.raises(ValueError, match="non-standard source resolution"):
        ds.get_batch([0, 1], np.random.default_rng(0))
