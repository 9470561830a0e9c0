"""Figure building / prediction-image saving (reference FigureBuilder.py and
the predict_step plotting in GraphBinsLM.py:343-372).

Matplotlib grids: rows of (RGB, GT depth, predicted depth[, detections]) with
the shared 'inferno_r' colormap, under-range mapped to white.
"""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from objcavit_tpu.data.preprocess import imagenet_unnormalize


def _depth_cmap(for_gt: bool):
    cmap = plt.get_cmap("inferno_r").copy()
    if for_gt:
        cmap.set_bad(color="1")
        cmap.set_under(color="1")
    return cmap


def save_prediction_images(
    out_dir: str,
    idx: int,
    image_normed: np.ndarray,  # (H, W, 3) ImageNet-normalised
    depth_gt: np.ndarray,  # (H, W, 1)
    depth_pred: np.ndarray,  # (h, w, 1)
    min_depth: float,
    detections_image: np.ndarray | None = None,
):
    """Per-image artifacts of predict mode: PNGs + raw arrays."""
    img = np.clip(imagenet_unnormalize(image_normed), 0, 1)
    vmax = float(depth_gt.max())

    plt.clf()
    plt.axis("off")
    plt.imshow(img)
    plt.savefig(os.path.join(out_dir, f"{idx}_im.png"), bbox_inches="tight", dpi=250)
    if detections_image is not None:
        plt.imshow(np.clip(detections_image, 0, 1))
        plt.savefig(
            os.path.join(out_dir, f"{idx}_dets.png"), bbox_inches="tight", dpi=250
        )
    plt.imshow(depth_gt[..., 0], vmin=min_depth, vmax=vmax, cmap=_depth_cmap(True))
    plt.savefig(
        os.path.join(out_dir, f"{idx}_depth_gt.png"), bbox_inches="tight", dpi=250
    )
    plt.imshow(depth_pred[..., 0], vmin=min_depth, vmax=vmax, cmap=_depth_cmap(False))
    plt.savefig(
        os.path.join(out_dir, f"{idx}_depth_pred.png"), bbox_inches="tight", dpi=250
    )
    np.save(os.path.join(out_dir, f"{idx}_depth_gt_raw.npy"), depth_gt)
    np.save(os.path.join(out_dir, f"{idx}_depth_pred_raw.npy"), depth_pred)
    plt.close("all")


def build_batch_figure(
    images_normed: np.ndarray,  # (B, H, W, 3)
    depth_gt: np.ndarray,  # (B, H, W, 1)
    depth_pred: np.ndarray,  # (B, h, w, 1)
    num_samples: int = 4,
    detections: np.ndarray | None = None,
):
    """N x 3(+1) grid figure for TensorBoard (FigureBuilder.py:64-125)."""
    n = min(num_samples, images_normed.shape[0])
    cols = 3 + (1 if detections is not None else 0)
    fig, axes = plt.subplots(n, cols, figsize=(4 * cols, 3 * n), squeeze=False)
    titles = ["RGB", "GT depth", "Predicted depth"] + (
        ["Detections"] if detections is not None else []
    )
    for i in range(n):
        vmax = float(depth_gt[i].max())
        img = np.clip(imagenet_unnormalize(images_normed[i]), 0, 1)
        panels = [
            (img, None),
            (depth_gt[i, ..., 0], _depth_cmap(True)),
            (depth_pred[i, ..., 0], _depth_cmap(False)),
        ]
        if detections is not None:
            panels.append((np.clip(detections[i], 0, 1), None))
        for j, (panel, cmap) in enumerate(panels):
            ax = axes[i][j]
            if cmap is None:
                ax.imshow(panel)
            else:
                ax.imshow(panel, vmin=0.0, vmax=vmax, cmap=cmap)
            ax.set_axis_off()
            if i == 0:
                ax.set_title(titles[j])
    fig.tight_layout()
    return fig
