"""Host-side per-sample preprocessing (numpy/PIL), both reference pipelines.

Two pipelines exist in the reference and both are reproduced because the
released checkpoint was trained with the legacy one:

  * "old_dl" (datasets/dataloader.py:116-270, BTS/AdaBins lineage, selected by
    ``basic.use_adabins_dataloader``): kb-crop -> NYU boundary crop
    (43,45,608,472) -> PIL random rotate -> /255, depth/factor -> numpy random
    crop -> flip/gamma/brightness/per-channel colour -> ImageNet normalise
    (inside the loader).
  * "new" (modules/Preprocess.py): /255, depth/factor -> kb-crop -> NYU crop
    (45,43,427,565) -> random rotate (bilinear image / nearest depth, shared
    angle) -> random crop. Flip/gamma/planckian + normalisation then run
    on-device per batch (see augment.py), matching on_after_batch_transfer.

All functions are pure numpy (HWC float32); the TPU never sees ragged shapes.
"""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def imagenet_normalize(image: np.ndarray) -> np.ndarray:
    return (image - IMAGENET_MEAN) / IMAGENET_STD


def imagenet_unnormalize(image: np.ndarray) -> np.ndarray:
    return image * IMAGENET_STD + IMAGENET_MEAN


def kb_crop(image: np.ndarray, depth: np.ndarray | None):
    """KITTI benchmark crop to 352x1216 (Preprocess.py:91-111)."""
    h, w = image.shape[:2]
    top = int(h - 352)
    left = int((w - 1216) / 2)
    image = image[top : top + 352, left : left + 1216]
    if depth is not None:
        depth = depth[top : top + 352, left : left + 1216]
    return image, depth


def _pil_rotate(arr: np.ndarray, angle: float, nearest: bool) -> np.ndarray:
    """PIL Image.rotate on raw-valued arrays; no value rescaling."""
    from PIL import Image

    resample = Image.NEAREST if nearest else Image.BILINEAR
    if arr.ndim == 3 and arr.shape[2] == 1:
        img = Image.fromarray(arr[:, :, 0].astype(np.float32), mode="F")
        out = np.asarray(img.rotate(angle, resample=resample), dtype=np.float32)
        return out[:, :, None]
    img = Image.fromarray(arr.astype(np.uint8))
    return np.asarray(img.rotate(angle, resample=resample), dtype=np.float32)


def random_crop(image, depth, height, width, rng: np.random.Generator):
    assert image.shape[0] >= height and image.shape[1] >= width
    x = rng.integers(0, image.shape[1] - width + 1)
    y = rng.integers(0, image.shape[0] - height + 1)
    return (
        image[y : y + height, x : x + width],
        depth[y : y + height, x : x + width],
    )


def old_dl_stage_a(
    image_u8: np.ndarray,
    depth_raw: np.ndarray,
    dataset: str,
    do_kb_crop: bool,
    do_random_rotate: bool,
    degree: float,
    depth_norm_factor: float,
    rng: np.random.Generator,
) -> tuple[np.ndarray, np.ndarray]:
    """Legacy train pipeline, stage A (per-sample, pre-crop): kb/NYU crops,
    PIL rotate, float scaling (dataloader.py:116-165). Stage B (crop +
    flip/gamma/colour/normalise + stack) runs either per-sample below or as
    one threaded native batch pass (native.assemble_batch)."""
    angle = None
    if do_random_rotate:
        angle = (rng.random() - 0.5) * 2 * degree
    return old_dl_stage_a_apply(
        image_u8, depth_raw, dataset, do_kb_crop, angle, depth_norm_factor
    )


def old_dl_stage_a_apply(
    image_u8: np.ndarray,
    depth_raw: np.ndarray,
    dataset: str,
    do_kb_crop: bool,
    angle: float | None,
    depth_norm_factor: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Stage A with the rotate angle already drawn (RNG-free), so decode +
    rotate can run in a thread pool while the RNG draws stay serial."""
    image = image_u8
    depth = depth_raw if depth_raw.ndim == 3 else depth_raw[:, :, None]

    if do_kb_crop:
        image, depth = kb_crop(image, depth)
    if dataset == "nyu":
        # blank-boundary crop (dataloader.py:149-151), PIL box (43,45,608,472)
        image = image[45:472, 43:608]
        depth = depth[45:472, 43:608]

    if angle is not None:
        image = _pil_rotate(image, angle, nearest=False)
        depth = _pil_rotate(depth, angle, nearest=True)

    # the reference converts to float and scales *after* the PIL ops
    # (dataloader.py:158-165)
    image = image.astype(np.float32) / 255.0
    depth = depth.astype(np.float32) / depth_norm_factor
    return image, depth


def old_dl_stage_a_static_shape(dataset: str, do_kb_crop: bool):
    """Post-stage-A (H, W) when it does not depend on the decoded image —
    kb-crop output is fixed (352, 1216) and the NYU blank-boundary crop of
    the standard 480x640 source is (427, 565). None = input-dependent
    (the parallel batch path then falls back to serial stage A)."""
    if do_kb_crop:
        return (352, 1216)
    if dataset == "nyu":
        return (427, 565)
    return None


def old_dl_draw_aug(
    dataset: str,
    image_shape: tuple,
    train_dims: tuple,
    rng: np.random.Generator,
) -> dict:
    """Stage-B parameter draws, in the EXACT serial order of the per-sample
    path (crop x, crop y, flip, do_augment, gamma, brightness, colours) so
    batch-mode assembly is bit-identical to sample-mode."""
    h, w = train_dims
    x = int(rng.integers(0, image_shape[1] - w + 1))
    y = int(rng.integers(0, image_shape[0] - h + 1))
    flip = rng.random() > 0.5
    do_augment = rng.random() > 0.5
    gamma = float(rng.uniform(0.9, 1.1))
    brightness = float(
        rng.uniform(0.75, 1.25) if dataset == "nyu" else rng.uniform(0.9, 1.1)
    )
    colors = rng.uniform(0.9, 1.1, size=3).astype(np.float32)
    return {
        "crop_yx": (y, x), "flip": flip, "do_augment": do_augment,
        "gamma": gamma, "brightness": brightness, "colors": colors,
    }


def old_dl_train_sample(
    image_u8: np.ndarray,
    depth_raw: np.ndarray,
    dataset: str,
    do_kb_crop: bool,
    do_random_rotate: bool,
    degree: float,
    train_dims: tuple,
    depth_norm_factor: float,
    rng: np.random.Generator,
) -> tuple[np.ndarray, np.ndarray]:
    """Legacy AdaBins/BTS train pipeline (dataloader.py:116-270).

    image_u8: HWC uint8; depth_raw: HW(1) raw units. Returns ImageNet-normed
    image and depth in metres, both HWC float32 at train_dims.
    """
    image, depth = old_dl_stage_a(
        image_u8, depth_raw, dataset, do_kb_crop, do_random_rotate, degree,
        depth_norm_factor, rng,
    )
    aug = old_dl_draw_aug(dataset, image.shape, train_dims, rng)
    y, x = aug["crop_yx"]
    h, w = train_dims
    image = image[y : y + h, x : x + w]
    depth = depth[y : y + h, x : x + w]

    # flip / gamma / brightness / colour / normalise (dataloader.py:239-284)
    # fused into one native pass (objcavit_tpu/data/native.py)
    from objcavit_tpu.data import native

    image = native.augment_normalize(
        image, aug["flip"], aug["do_augment"], aug["gamma"],
        aug["brightness"], aug["colors"],
    )
    if aug["flip"]:
        depth = depth[:, ::-1].copy()
    return image.astype(np.float32), depth.astype(np.float32)


def new_train_sample(
    image_u8: np.ndarray,
    depth_raw: np.ndarray,
    dataset: str,
    do_kb_crop: bool,
    do_random_rotate: bool,
    degree: float,
    train_dims: tuple,
    image_norm_factor: float,
    depth_norm_factor: float,
    rng: np.random.Generator,
) -> tuple[np.ndarray, np.ndarray]:
    """New-path host preprocessing (modules/Preprocess.py forward, train mode).

    Returns [0,1] image + metre depth at train_dims; flip/gamma/planckian and
    ImageNet normalisation happen on-device afterwards.
    """
    image = image_u8.astype(np.float32) / image_norm_factor
    depth = (depth_raw if depth_raw.ndim == 3 else depth_raw[:, :, None]).astype(
        np.float32
    ) / depth_norm_factor

    if do_kb_crop:
        image, depth = kb_crop(image, depth)
    if dataset == "nyu":
        # torchvision crop(top=45, left=43, height=427, width=565)
        image = image[45 : 45 + 427, 43 : 43 + 565]
        depth = depth[45 : 45 + 427, 43 : 43 + 565]

    if do_random_rotate:
        from objcavit_tpu.data import native

        angle = rng.uniform(-degree, degree)
        image = native.rotate_bilinear(image, angle)
        depth = native.rotate_nearest(depth, angle)

    image, depth = random_crop(image, depth, train_dims[0], train_dims[1], rng)
    return image.astype(np.float32), depth.astype(np.float32)


def eval_sample(
    image_u8: np.ndarray,
    depth_raw: np.ndarray | None,
    do_kb_crop: bool,
    image_norm_factor: float,
    depth_norm_factor: float,
    normalize: bool,
) -> tuple[np.ndarray, np.ndarray | None]:
    """Deterministic eval preprocessing (both pipelines agree here)."""
    image = image_u8.astype(np.float32) / image_norm_factor
    depth = None
    if depth_raw is not None:
        depth = (
            depth_raw if depth_raw.ndim == 3 else depth_raw[:, :, None]
        ).astype(np.float32) / depth_norm_factor
    if do_kb_crop:
        image, depth = kb_crop(image, depth)
    if normalize:
        image = imagenet_normalize(image)
    return image.astype(np.float32), depth


def _rotation_grid(h: int, w: int, angle_deg: float):
    """Kornia-style rotation sampling grid about the image centre."""
    a = np.deg2rad(angle_deg)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    # inverse rotation: output pixel samples input at R^{-1} (p - c) + c
    cos_a, sin_a = np.cos(a), np.sin(a)
    x0 = xs - cx
    y0 = ys - cy
    sx = cos_a * x0 + sin_a * y0 + cx
    sy = -sin_a * x0 + cos_a * y0 + cy
    return sy, sx


def _rotate_bilinear_np(img: np.ndarray, angle: float) -> np.ndarray:
    h, w = img.shape[:2]
    sy, sx = _rotation_grid(h, w, angle)
    y0 = np.floor(sy).astype(np.int64)
    x0 = np.floor(sx).astype(np.int64)
    fy = (sy - y0)[..., None]
    fx = (sx - x0)[..., None]

    def tap(yy, xx):
        inb = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))[..., None]
        v = img[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)]
        return v * inb

    out = (
        tap(y0, x0) * (1 - fy) * (1 - fx)
        + tap(y0, x0 + 1) * (1 - fy) * fx
        + tap(y0 + 1, x0) * fy * (1 - fx)
        + tap(y0 + 1, x0 + 1) * fy * fx
    )
    return out.astype(np.float32)


def _rotate_nearest_np(img: np.ndarray, angle: float) -> np.ndarray:
    h, w = img.shape[:2]
    sy, sx = _rotation_grid(h, w, angle)
    yy = np.rint(sy).astype(np.int64)
    xx = np.rint(sx).astype(np.int64)
    inb = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))[..., None]
    v = img[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)]
    return (v * inb).astype(np.float32)
