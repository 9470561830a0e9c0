"""Object providers: the fixed-shape detection/language feed for GraphBins.

The reference runs YOLOv7-seg + WordNet + CLIP inline, per training step, on
the CPU-bound critical path (GraphBins.py:90-106 — NMS sync, python loops,
string building). TPU-native design inverts this: a provider produces a padded
``{'features' (B,N,512), 'xywh' (B,N,4), 'valid' (B,N)}`` structure; the depth
model consumes it as plain tensors.

Providers:
  * ZerosObjectProvider — the 'control_obj_zeros_512' ablation
    (LanguageEmbeddingWrapper.py:56-61): zero features; boxes from a detector.
    Without one it emits the no-detection sentinel (xywh=-1, 1 valid UNK slot)
    for every image — the exact reference behaviour when YOLO finds nothing.
  * StubObjectProvider — deterministic fake boxes (tests / data-free runs).
  * YoloClipObjectProvider (language/ + models/yolov7.py) — the real pipeline,
    a separate jit program whose embeddings come from the phrase cache.
"""

from __future__ import annotations

import numpy as np


class SlotSizing:
    """Mixin deriving the padded slot count from the incoming batch.

    ``n_max=None`` (the production default) sizes slots per call as
    min(max_det, image seq len of the batch's own (h, w)) — train batches get
    the train-resolution capacity, eval batches the eval-resolution one,
    mirroring the reference where ObjCAViT pads objects to the CURRENT
    image's sequence length (ObjCAViT.py:191-194) and the detector keeps up
    to max_det=1000 (basicParams.yaml:34). A fixed ``n_max`` pins the slot
    count (tests/benchmarks)."""

    def _init_sizing(self, n_max, max_det, final_upscale):
        self.n_max = n_max
        self.max_det = int(max_det)
        self.final_upscale = bool(final_upscale)

    def slots(self, images: np.ndarray) -> int:
        if self.n_max is not None:
            return int(self.n_max)
        from objcavit_tpu.training.steps import image_seq_len

        h, w = images.shape[1:3]
        return min(self.max_det, image_seq_len(h, w, self.final_upscale))


class ZerosObjectProvider(SlotSizing):
    """Zero language features; sentinel boxes unless a detector is supplied."""

    def __init__(self, n_max: int | None = 32, obj_dim: int = 512,
                 detector=None, max_det: int = 1000,
                 final_upscale: bool = False):
        self._init_sizing(n_max, max_det, final_upscale)
        self.obj_dim = obj_dim
        self.detector = detector

    def __call__(self, images_normed: np.ndarray) -> dict:
        b = images_normed.shape[0]
        n_max = self.slots(images_normed)
        if self.detector is not None:
            det = self.detector(images_normed, n_max)
            return {
                "features": np.zeros((b, n_max, self.obj_dim), np.float32),
                "xywh": det["xywh"],
                "valid": det["valid"],
            }
        xywh = np.full((b, n_max, 4), -1.0, np.float32)
        valid = np.zeros((b, n_max), bool)
        valid[:, 0] = True  # the <UNK> sentinel slot (ObjCAViT.py:310-315)
        return {
            "features": np.zeros((b, n_max, self.obj_dim), np.float32),
            "xywh": xywh,
            "valid": valid,
        }


class StubObjectProvider(SlotSizing):
    """Deterministic pseudo-detections for tests/benchmarks without weights."""

    def __init__(self, n_max: int | None = 32, obj_dim: int = 512,
                 seed: int = 0, max_det: int = 1000,
                 final_upscale: bool = False):
        self._init_sizing(n_max, max_det, final_upscale)
        self.obj_dim = obj_dim
        self.seed = seed
        self._count = 0

    def __call__(self, images_normed: np.ndarray) -> dict:
        b, h, w = images_normed.shape[:3]
        n_max = self.slots(images_normed)
        rng = np.random.default_rng(self.seed + self._count)
        self._count += 1
        # scale stub counts with capacity so large-slot regimes (300 NYU /
        # 418 KITTI) exercise the object-rich gather branch, not just the
        # first 32 slots (advisor r4): cap grows as 32 + n_max // 8
        n_obj = rng.integers(0, min(n_max, 32 + n_max // 8), size=b)
        xywh = np.full((b, n_max, 4), -1.0, np.float32)
        valid = np.zeros((b, n_max), bool)
        feats = np.zeros((b, n_max, self.obj_dim), np.float32)
        for i in range(b):
            n = int(n_obj[i])
            if n == 0:
                valid[i, 0] = True  # UNK sentinel
                feats[i, 0] = rng.standard_normal(self.obj_dim) * 0.02
                continue
            cx = rng.uniform(0, w, n)
            cy = rng.uniform(0, h, n)
            bw = rng.uniform(8, w / 2, n)
            bh = rng.uniform(8, h / 2, n)
            xywh[i, :n] = np.stack([cx, cy, bw, bh], axis=1)
            valid[i, :n] = True
            feats[i, :n] = rng.standard_normal((n, self.obj_dim)) * 0.02
        return {"features": feats, "xywh": xywh, "valid": valid}


def mirror_objects(objects: dict, image_width: int) -> dict:
    """Detections for the horizontally-flipped image: x -> W - x (centres)."""
    xywh = objects["xywh"].copy()
    real = objects["valid"] & (xywh[..., 0] >= 0)
    xywh[..., 0] = np.where(real, image_width - xywh[..., 0], xywh[..., 0])
    return {**objects, "xywh": xywh}
