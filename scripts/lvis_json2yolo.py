#!/usr/bin/env python
"""Offline tool: LVIS JSON -> YOLO segmentation annotations + split lists.

Standalone CLI mirroring the reference's scripts/lvis_json2yolo.py: per-image
YOLO-seg label files (``category_id x1 y1 ... xn yn`` with normalised
polygon coords, multi-polygon annotations stitched into one ring), split
filename txts, and a category-id -> synset yaml.

Works from raw LVIS JSON with the stdlib json module (no lvis-api
dependency — this image has none, and the format is plain COCO-style JSON).
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os

import numpy as np


def closest_pair_indices(a: np.ndarray, b: np.ndarray) -> tuple[int, int]:
    """Indices of the closest points between two (N,2)/(M,2) polygons."""
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return np.unravel_index(np.argmin(d), d.shape)  # type: ignore[return-value]


def stitch_polygons(polys: list[list[float]]) -> np.ndarray:
    """Merge multiple polygons into one ring by bridging closest vertices.

    Greedy: start from the first polygon; repeatedly splice in the remaining
    polygon whose closest vertex pair to the current ring is minimal. The
    bridge traverses out and back along the same thin line, preserving area.
    """
    rings = [np.asarray(p, np.float64).reshape(-1, 2) for p in polys]
    merged = rings[0]
    rest = rings[1:]
    while rest:
        best = None
        for ri, ring in enumerate(rest):
            i, j = closest_pair_indices(merged, ring)
            d = ((merged[i] - ring[j]) ** 2).sum()
            if best is None or d < best[0]:
                best = (d, ri, i, j)
        _, ri, i, j = best
        ring = np.roll(rest.pop(ri), -j, axis=0)  # ring now starts at vertex j
        # splice: ...merged[i], ring[0..], ring[0], merged[i], merged[i+1]...
        merged = np.concatenate(
            [merged[: i + 1], ring, ring[:1], merged[i : i + 1], merged[i + 1 :]]
        )
    return merged


def image_label_lines(img: dict, anns: list[dict]) -> list[str]:
    h, w = img["height"], img["width"]
    scale = np.array([w, h], np.float64)
    lines = []
    for ann in anns:
        seg = ann.get("segmentation") or []
        if not seg:
            continue
        if len(seg) > 1:
            pts = stitch_polygons(seg)
        else:
            pts = np.asarray(seg[0], np.float64).reshape(-1, 2)
        flat = (pts / scale).reshape(-1)
        coords = " ".join(str(x) for x in flat.tolist())
        lines.append(f"{ann['category_id']} {coords}")
    return lines


def convert_split(json_path: str, labels_dir: str, split_txt: str) -> list[str]:
    logging.info("loading %s", json_path)
    with open(json_path) as f:
        data = json.load(f)
    anns_by_img: dict[int, list[dict]] = {}
    for ann in data.get("annotations", []):
        anns_by_img.setdefault(ann["image_id"], []).append(ann)

    os.makedirs(labels_dir, exist_ok=True)
    filepaths = []
    for img in data["images"]:
        fname = img["coco_url"].split("/")[-1]
        filepaths.append(os.path.join("./coco", "images", fname))
        anns = anns_by_img.get(img["id"])
        if anns is None:
            continue
        stem = fname.rsplit(".", 1)[0]
        with open(os.path.join(labels_dir, f"{stem}.txt"), "w") as f:
            f.write("\n".join(image_label_lines(img, anns)) + "\n")

    with open(split_txt, "w") as f:
        f.write("\n".join(filepaths) + "\n")
    return [c for c in data.get("categories", [])]


def save_category_yaml(categories: list[dict], path: str) -> None:
    with open(path, "w") as f:
        f.write("names:\n")
        for cat in categories:
            f.write(f"  {cat['id']}: {cat['synset']}\n")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--lvis_path", required=True, help="LVIS root dir")
    parser.add_argument("--write_labels", action="store_true",
                        help="also write per-image YOLO-seg label files")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, force=True)

    labels_dir = os.path.join(args.lvis_path, "coco", "labels")
    cats = None
    for split in ("train", "val", "test"):
        matches = glob.glob(os.path.join(args.lvis_path, "lvis", f"*{split}*.json"))
        if not matches:
            logging.warning("no %s json found", split)
            continue
        out_txt = os.path.join(args.lvis_path, f"lvis_{split}_files.txt")
        c = convert_split(matches[0], labels_dir, out_txt)
        cats = cats or c
    if cats:
        save_category_yaml(cats, os.path.join(args.lvis_path, "category_names.yaml"))
    logging.info("done")


if __name__ == "__main__":
    main()
