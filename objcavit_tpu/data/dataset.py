"""Split-file-driven NYU/KITTI datasets with a synthetic fallback.

Replicates datasets/NYUD2.py, datasets/KITTI.py and the path handling of the
legacy loader (datasets/dataloader.py:96-135): split lines are
``image_path depth_path focal`` (KITTI train lines add right-camera paths at
indices 3/4), leading slashes are stripped, and KITTI eval samples with
missing GT are dropped-and-retried.

When the dataset root does not exist (this image carries no NYU/KITTI data),
``make_dataset`` returns a deterministic synthetic dataset with the same
sample contract — used by --debug runs, tests, and benchmarks.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from objcavit_tpu.data import preprocess as pp


def remove_leading_slash(s: str) -> str:
    return s[1:] if s and s[0] in ("/", "\\") else s


class DepthDataset:
    """One dataset+mode (train / online_eval) view over a split file."""

    def __init__(self, args: Any, mode: str):
        self.args = args
        self.mode = mode
        self.dataset = args.basic.dataset
        self.dcfg = args[self.dataset]
        self.use_old_dl = bool(args.basic.get("use_adabins_dataloader"))

        split_file = (
            self.dcfg.filenames_file_train
            if mode == "train"
            else self.dcfg.filenames_file_eval
        )
        # basicParams.yaml points at ./datasets/split_filenames_files/*.txt
        # (cwd-relative, as the reference runs from its repo root). The split
        # files are vendored in this repo, so fall back to resolving against
        # the repo root when the cwd-relative path is absent.
        if not os.path.isabs(split_file) and not os.path.exists(split_file):
            repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
            cand = os.path.join(repo_root, split_file)
            if os.path.exists(cand):
                split_file = cand
        with open(split_file, "r") as f:
            self.filenames = [ln for ln in f.read().splitlines() if ln.strip()]

        base = os.path.join(args.paths.data_dir, self.dcfg.base_path)
        if self.dataset == "kitti":
            self.data_path = os.path.join(base, self.dcfg.data_path)
            self.gt_path = os.path.join(base, self.dcfg.gt_path)
        else:
            sub = self.dcfg.train_path if mode == "train" else self.dcfg.eval_path
            self.data_path = os.path.join(base, sub)
            self.gt_path = self.data_path

        self.train_dims = tuple(self.dcfg.dimensions_train)
        # decode+rotate thread-pool width for get_batch's parallel fast path;
        # None = one per host core (PNG decode dominates host loading cost)
        self.decode_threads: int | None = None

    def __len__(self) -> int:
        return len(self.filenames)

    def _paths(self, line: str, rng: np.random.Generator):
        parts = line.split()
        use_right = (
            self.mode == "train"
            and self.dataset == "kitti"
            and self.dcfg.get("use_right") is True
            and rng.random() > 0.5
        )
        i_img, i_dep = (3, 4) if use_right and len(parts) > 4 else (0, 1)
        image_path = os.path.join(self.data_path, remove_leading_slash(parts[i_img]))
        depth_path = os.path.join(self.gt_path, remove_leading_slash(parts[i_dep]))
        return image_path, depth_path, float(parts[2])

    def get(self, idx: int, rng: np.random.Generator) -> dict:
        """Returns {'image' HWC f32, 'depth' HWC f32, 'focal', paths...}.

        Train images come out ready for the device: old_dl path is already
        ImageNet-normalised; new path is [0,1] (device augments+normalises).
        """
        from PIL import Image

        line = self.filenames[idx % len(self.filenames)]
        image_path, depth_path, focal = self._paths(line, rng)

        image_u8 = np.asarray(Image.open(image_path).convert("RGB"))
        depth_raw = None
        if os.path.exists(depth_path):
            depth_raw = np.asarray(Image.open(depth_path), dtype=np.float32)
        elif self.mode == "online_eval":
            # KITTI missing-GT convention: drop the sample and retry
            # (KITTI.py:81-83, dataloader.py:188-192)
            del self.filenames[idx % len(self.filenames)]
            return self.get(idx, rng)

        if self.mode == "train":
            if depth_raw is None:  # not assert: must survive python -O
                raise FileNotFoundError(f"missing train GT: {depth_path}")
            if self.use_old_dl:
                image, depth = pp.old_dl_train_sample(
                    image_u8, depth_raw, self.dataset, self.dcfg.do_kb_crop,
                    self.dcfg.do_random_rotate, self.dcfg.degree,
                    self.train_dims, self.dcfg.depth_norm_factor, rng,
                )
            else:
                image, depth = pp.new_train_sample(
                    image_u8, depth_raw, self.dataset, self.dcfg.do_kb_crop,
                    self.dcfg.do_random_rotate, self.dcfg.degree,
                    self.train_dims, self.dcfg.image_norm_factor,
                    self.dcfg.depth_norm_factor, rng,
                )
        else:
            image, depth = pp.eval_sample(
                image_u8, depth_raw, self.dcfg.do_kb_crop,
                self.dcfg.image_norm_factor, self.dcfg.depth_norm_factor,
                normalize=True,
            )

        return {
            "image": image,
            "depth": depth,
            "focal": focal,
            "image_path": line.split()[0],
            "depth_path": line.split()[1],
        }

    def get_batch(self, idxs, rng: np.random.Generator):
        """Batch-granularity loading for the legacy train path: stage A
        (decode/crop/rotate) per sample, then ONE threaded native pass for
        crop + augment + normalise + stack (csrc assemble_batch_f32).

        RNG draws happen in the exact serial order of repeated ``get`` calls,
        so the produced batch is bit-identical to the per-sample path. When
        the post-stage-A shape is input-independent (NYU / kb-crop), every
        RNG draw is hoisted into one serial pass and the RNG-free decode +
        rotate runs in a thread pool (``decode_threads``, default one per
        host core) — PNG decode is the host pipeline's dominant cost and the
        per-sample path caps the feed rate at one core's worth.
        Returns None when the fast path doesn't apply (loader falls back).
        """
        from objcavit_tpu.data import native

        if not (self.mode == "train" and self.use_old_dl
                and native.native_available()):
            return None
        from PIL import Image

        n_threads = self.decode_threads or (os.cpu_count() or 1)
        shape_a = pp.old_dl_stage_a_static_shape(
            self.dataset, self.dcfg.do_kb_crop
        )
        if n_threads > 1 and len(idxs) > 1 and shape_a is not None:
            return self._get_batch_parallel(idxs, rng, shape_a, n_threads)

        images, depths, augs, metas = [], [], [], []
        for idx in idxs:
            line = self.filenames[int(idx) % len(self.filenames)]
            image_path, depth_path, focal = self._paths(line, rng)
            image_u8 = np.asarray(Image.open(image_path).convert("RGB"))
            # mirror get()'s explicit missing-GT failure (the serial path this
            # claims bit-parity with) instead of a raw PIL FileNotFoundError;
            # not assert: must survive python -O
            if not os.path.exists(depth_path):
                raise FileNotFoundError(f"missing train GT: {depth_path}")
            depth_raw = np.asarray(Image.open(depth_path), dtype=np.float32)
            img, dep = pp.old_dl_stage_a(
                image_u8, depth_raw, self.dataset, self.dcfg.do_kb_crop,
                self.dcfg.do_random_rotate, self.dcfg.degree,
                self.dcfg.depth_norm_factor, rng,
            )
            augs.append(pp.old_dl_draw_aug(self.dataset, img.shape,
                                           self.train_dims, rng))
            images.append(img)
            depths.append(dep)
            metas.append((focal, line.split()[0], line.split()[1]))
        return self._assemble(images, depths, augs, metas)

    def _get_batch_parallel(self, idxs, rng, shape_a, n_threads):
        """RNG pass (serial, preserves the per-sample draw order: paths ->
        rotate angle -> stage-B aug) then decode+rotate fanned out over a
        thread pool — PIL's PNG decode and C transforms release the GIL."""
        from concurrent.futures import ThreadPoolExecutor

        from PIL import Image

        specs, augs, metas = [], [], []
        for idx in idxs:
            line = self.filenames[int(idx) % len(self.filenames)]
            image_path, depth_path, focal = self._paths(line, rng)
            angle = None
            if self.dcfg.do_random_rotate:
                # the exact draw old_dl_stage_a makes (preprocess.py)
                angle = (rng.random() - 0.5) * 2 * self.dcfg.degree
            augs.append(
                pp.old_dl_draw_aug(self.dataset, shape_a, self.train_dims, rng)
            )
            specs.append((image_path, depth_path, angle))
            metas.append((focal, line.split()[0], line.split()[1]))

        def load(spec):
            image_path, depth_path, angle = spec
            image_u8 = np.asarray(Image.open(image_path).convert("RGB"))
            if not os.path.exists(depth_path):
                raise FileNotFoundError(f"missing train GT: {depth_path}")
            depth_raw = np.asarray(Image.open(depth_path), dtype=np.float32)
            img, dep = pp.old_dl_stage_a_apply(
                image_u8, depth_raw, self.dataset, self.dcfg.do_kb_crop,
                angle, self.dcfg.depth_norm_factor,
            )
            if img.shape[:2] != shape_a:
                # the stage-B crop draws above assumed this shape; a
                # mismatch means non-standard source resolution
                raise ValueError(
                    f"{image_path}: post-crop shape {img.shape[:2]} != "
                    f"expected {shape_a} — non-standard source resolution; "
                    f"set dataset.decode_threads = 1"
                )
            return img, dep

        with ThreadPoolExecutor(n_threads) as ex:
            loaded = list(ex.map(load, specs))
        return self._assemble(
            [x[0] for x in loaded], [x[1] for x in loaded], augs, metas
        )

    def _assemble(self, images, depths, augs, metas):
        from objcavit_tpu.data import native

        h, w = self.train_dims
        out_imgs, out_deps = native.assemble_batch(
            images, depths,
            np.asarray([a["crop_yx"] for a in augs], np.int32),
            np.asarray([a["flip"] for a in augs]),
            np.asarray([a["do_augment"] for a in augs]),
            np.asarray([a["gamma"] for a in augs], np.float32),
            np.asarray([a["brightness"] for a in augs], np.float32),
            np.stack([a["colors"] for a in augs]),
            h, w,
        )
        batch = {"image": out_imgs, "depth": out_deps}
        meta = {
            "focal": [m[0] for m in metas],
            "image_path": [m[1] for m in metas],
            "depth_path": [m[2] for m in metas],
        }
        return batch, meta


class SyntheticDepthDataset:
    """Deterministic fake data with the real sample contract (no dataset on
    disk). Image content is seeded by index so runs are reproducible."""

    def __init__(self, args: Any, mode: str, length: int = 64):
        self.args = args
        self.mode = mode
        self.dataset = args.basic.dataset
        self.dcfg = args[self.dataset]
        self.length = length
        self.use_old_dl = bool(args.basic.get("use_adabins_dataloader"))
        if mode == "train":
            self.dims = tuple(self.dcfg.dimensions_train)
        elif self.dcfg.do_kb_crop:
            self.dims = (352, 1216)
        else:
            self.dims = tuple(self.dcfg.dimensions_test)

    def __len__(self) -> int:
        return self.length

    def get(self, idx: int, rng: np.random.Generator) -> dict:
        h, w = self.dims
        srng = np.random.default_rng(idx)
        image = srng.uniform(0.0, 1.0, (h, w, 3)).astype(np.float32)
        depth = srng.uniform(
            self.dcfg.min_depth * 2, self.dcfg.max_depth * 0.9, (h, w, 1)
        ).astype(np.float32)
        normalize_now = self.mode != "train" or self.use_old_dl
        if normalize_now:
            image = pp.imagenet_normalize(image)
        return {
            "image": image,
            "depth": depth,
            "focal": 518.8579,
            "image_path": f"synthetic/{idx}.jpg",
            "depth_path": f"synthetic/{idx}.png",
        }


def make_dataset(args: Any, mode: str):
    """Real dataset if the split file and data root exist, else synthetic."""
    dcfg = args[args.basic.dataset]
    split_file = (
        dcfg.filenames_file_train if mode == "train" else dcfg.filenames_file_eval
    )
    root = os.path.join(args.paths.data_dir, dcfg.base_path)
    if os.path.exists(split_file) and os.path.isdir(root):
        return DepthDataset(args, mode)
    return SyntheticDepthDataset(args, mode, length=64 if mode == "train" else 16)
