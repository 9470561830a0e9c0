#!/usr/bin/env python
"""Host input-pipeline throughput: can the host feed the chip?

The reference hides data-loading cost in torch DataLoader worker processes
(GraphBinsLM.py:489-549); this framework's loader is a prefetch thread over
the native C++ batch assembler (csrc/preprocess.cpp). This bench writes a
synthetic on-disk NYU-format dataset (8-bit RGB PNG + 16-bit depth PNG at
480x640) and measures, in images/s at the training recipe's 416x544 crop
(old_dl pipeline: PIL decode -> stage-A rotate -> crop/flip/gamma/brightness/
color -> ImageNet normalise -> batch stack):

  * serial per-sample path (DepthDataset.get)                 [1 core]
  * native threaded batch assembly (DepthDataset.get_batch)   [N threads]
  * DeviceLoader end-to-end incl. prefetch + device_put       [steady state]

The chip consumes ~77 img/s training (bs=8 step = 104 ms) and ~219 img/s
fused serving; the host pipeline must sustain more than the training rate
for the device never to starve. Runs on CPU by default (device transfer
through the single-chip axon tunnel measures the tunnel, not the hardware);
pass --tpu to device_put onto the real chip anyway.
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_disk_dataset(root: str, n_unique: int = 16, n_lines: int = 256):
    """NYU-format tree: root/nyu/sync/{img,dep}_%02d.png + a split file."""
    from PIL import Image

    rng = np.random.default_rng(0)
    sync = os.path.join(root, "nyu", "sync")
    os.makedirs(sync, exist_ok=True)
    for i in range(n_unique):
        img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(sync, f"img_{i:02d}.png"))
        dep = rng.integers(500, 9500, (480, 640), dtype=np.uint16)
        Image.fromarray(dep, mode="I;16").save(
            os.path.join(sync, f"dep_{i:02d}.png")
        )
    split = os.path.join(root, "train_files.txt")
    with open(split, "w") as f:
        for k in range(n_lines):
            i = k % n_unique
            f.write(f"img_{i:02d}.png dep_{i:02d}.png 518.8579\n")
    return split


def make_args(root: str, split: str):
    from objcavit_tpu.config import Config

    return Config(
        {
            "basic": {"dataset": "nyu", "batch_size": 8,
                      "use_adabins_dataloader": True},
            "paths": {"data_dir": root, "run_dir": None},
            "nyu": {
                "filenames_file_train": split, "filenames_file_eval": split,
                "base_path": "nyu", "train_path": "sync", "eval_path": "sync",
                "image_norm_factor": 255.0, "depth_norm_factor": 1000.0,
                "min_depth": 0.001, "max_depth": 10, "eigen_crop": True,
                "garg_crop": False, "do_kb_crop": False,
                "do_random_rotate": True, "degree": 2.5,
                "dimensions_train": [416, 544],
                "dimensions_test": [480, 640],
            },
            "hardware": {"num_workers": 0},
        }
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="device_put batches onto the real chip (measures "
                         "the axon tunnel in this image, not the hardware)")
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--bs", type=int, default=8)
    cl = ap.parse_args()

    if not cl.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from objcavit_tpu.data import native
    from objcavit_tpu.data.dataset import DepthDataset
    from objcavit_tpu.data.loader import DeviceLoader
    from objcavit_tpu.parallel import make_mesh

    with tempfile.TemporaryDirectory() as root:
        split = make_disk_dataset(root)
        args = make_args(root, split)
        ds = DepthDataset(args, "train")
        n_img = cl.batches * cl.bs

        # warm PIL/zlib and the native library
        rng = np.random.default_rng(42)
        ds.get(0, rng)
        print(f"native C++ assembler available: {native.native_available()}",
              file=sys.stderr)

        # serial per-sample
        rng = np.random.default_rng(42)
        t0 = time.perf_counter()
        for i in range(n_img):
            ds.get(i % len(ds), rng)
        serial = n_img / (time.perf_counter() - t0)

        # native threaded batch assembly
        rng = np.random.default_rng(42)
        idx_sets = [
            np.arange(b * cl.bs, (b + 1) * cl.bs) % len(ds)
            for b in range(cl.batches)
        ]
        got = ds.get_batch(idx_sets[0], rng)  # warm; None -> no native path
        batched = float("nan")
        if got is not None:
            rng = np.random.default_rng(42)
            t0 = time.perf_counter()
            for idxs in idx_sets:
                ds.get_batch(idxs, rng)
            batched = n_img / (time.perf_counter() - t0)

        # DeviceLoader end-to-end (prefetch thread + shard/device_put)
        mesh = make_mesh()
        loader = DeviceLoader(ds, cl.bs, mesh, shuffle=True, drop_last=True)
        n_e2e = 0
        for batch, _meta in loader:  # warm one epoch's first batch
            break
        t0 = time.perf_counter()
        for batch, _meta in loader:
            n_e2e += cl.bs
            if n_e2e >= n_img:
                break
        e2e = n_e2e / (time.perf_counter() - t0)

        dev = "tpu" if cl.tpu else "cpu"
        print(
            f"serial get():      {serial:7.1f} img/s"
            f"\nnative get_batch:  {batched:7.1f} img/s"
            f"\nDeviceLoader e2e:  {e2e:7.1f} img/s  (device={dev}, bs={cl.bs})"
        )


if __name__ == "__main__":
    main()
