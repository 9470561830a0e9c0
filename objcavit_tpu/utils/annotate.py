"""Detection annotation: draw boxes, labels and instance masks on images.

Host-side replacement for the yolov7 Annotator/plot_masks path the reference
uses inside its training loop (Yolov7Wrapper.py:101-146) — here it runs only
when a human asks for a visualisation (predict mode / figure logging), never
on the training critical path.
"""

from __future__ import annotations

import numpy as np

# simple deterministic color table (RGB in [0,1])
_COLORS = np.array(
    [
        (0.90, 0.30, 0.25), (0.25, 0.60, 0.95), (0.35, 0.80, 0.40),
        (0.95, 0.75, 0.20), (0.70, 0.40, 0.90), (0.25, 0.85, 0.85),
        (0.95, 0.50, 0.65), (0.60, 0.60, 0.60), (0.55, 0.35, 0.20),
        (0.45, 0.90, 0.65),
    ],
    dtype=np.float32,
)


def class_color(cls_id: int) -> np.ndarray:
    return _COLORS[int(cls_id) % len(_COLORS)]


def annotate_image(
    image01: np.ndarray,  # (H, W, 3) in [0, 1]
    xywh: np.ndarray,  # (N, 4) centre-xywh pixels
    classes: np.ndarray,  # (N,)
    valid: np.ndarray,  # (N,) bool
    masks: np.ndarray | None = None,  # (N, H, W) in [0, 1]
    names: list[str] | None = None,
    line_width: int = 2,
    mask_alpha: float = 0.45,
) -> np.ndarray:
    """Returns an annotated copy of the image (float [0, 1])."""
    img = np.array(image01, dtype=np.float32, copy=True)
    h, w = img.shape[:2]
    for i in np.flatnonzero(np.asarray(valid)):
        color = class_color(classes[i])
        if masks is not None:
            m = (masks[i] > 0.5)[..., None].astype(np.float32)
            img = img * (1 - m * mask_alpha) + m * mask_alpha * color
        cx, cy, bw, bh = xywh[i]
        x1 = int(np.clip(cx - bw / 2, 0, w - 1))
        x2 = int(np.clip(cx + bw / 2, 0, w - 1))
        y1 = int(np.clip(cy - bh / 2, 0, h - 1))
        y2 = int(np.clip(cy + bh / 2, 0, h - 1))
        t = line_width
        img[y1 : y1 + t, x1 : x2 + 1] = color
        img[max(y2 - t + 1, 0) : y2 + 1, x1 : x2 + 1] = color
        img[y1 : y2 + 1, x1 : x1 + t] = color
        img[y1 : y2 + 1, max(x2 - t + 1, 0) : x2 + 1] = color
    return np.clip(img, 0.0, 1.0)
