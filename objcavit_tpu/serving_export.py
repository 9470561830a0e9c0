"""AOT export: serialize serving programs to portable, model-code-free artifacts.

The reference has no deployment story beyond "run the Lightning module in
Python" (`/root/reference/main.py:90-116`, the `-i` branch): serving a model
requires the full repo, its config tree, and a fresh trace on every process
start. A production TPU stack wants the opposite — compile the program once,
ship an artifact, and load it in a process that carries NO model code (no
flax modules, no config system, no detector/CLIP source): only `jax` and the
artifact. This module does that with `jax.export`:

    artifact_dir/
      program.jaxexport   serialized StableHLO + calling convention
                          (jax.export.Exported.serialize)
      weights.msgpack     the weight pytree (flax msgpack; canonical nested
                          dicts of numpy arrays)
      meta.json           shapes, eval dims, lowering platforms, jax version

Every exported program has the same uniform calling convention

    depth = call(weights_dict, frames_u8)      # (B, H, W, 3) uint8 -> depth

regardless of which pipeline produced it: sentinel objects (DepthPipeline)
and the detector/NMS/class-table stages (FusedDepthPipeline) are baked into
the program, and the weight pytree is canonicalised (msgpack round-trip) so
the on-disk treedef always matches the program's expected input tree.

Platform semantics: `jax.export` lowers for the platform(s) requested at
export time and refuses to run anywhere else. The model's Pallas kernels are
trace-time gated on `jax.default_backend() == "tpu"`, so a CPU export is
pure StableHLO (runs on any CPU host) while a TPU export bakes the Mosaic
custom calls and is a TPU-only artifact — `meta.json` records which.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

_PROGRAM = "program.jaxexport"
_WEIGHTS = "weights.msgpack"
_META = "meta.json"


def _canonicalize(pytree):
    """Round-trip a pytree through flax msgpack: nested plain dicts of numpy
    arrays — the exact tree the loader will reconstruct from disk, so the
    exported program's input treedef matches it by construction."""
    from flax import serialization

    return serialization.msgpack_restore(serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, pytree)
    ))


def export_pipeline(pipeline, frames_shape, *, platforms=None,
                    disabled_checks=()):
    """Export a DepthPipeline or FusedDepthPipeline as (Exported, weights).

    frames_shape: full uint8 input shape (B, H, W, 3) to compile for. The
    batch is static — XLA serving programs are fixed-shape by design (one
    artifact per served batch size; see `export_artifact` for the multi-batch
    convenience). platforms: lowering platforms (default: current backend).
    disabled_checks: passed to jax.export (needed to serialize TPU Mosaic
    custom calls on older jax versions; unused on CPU exports).
    """
    from objcavit_tpu.serving import DepthPipeline, FusedDepthPipeline

    frames_shape = tuple(frames_shape)
    frames_aval = jax.ShapeDtypeStruct(frames_shape, jnp.uint8)
    b = frames_shape[0]

    if isinstance(pipeline, FusedDepthPipeline):
        run = pipeline._build(frames_shape)
        weights = _canonicalize({
            "variables": pipeline.variables,
            "detector_params": pipeline.detector_params,
            "class_table": pipeline.class_table,
        })

        def call(weights, frames_u8):
            # [0]: the fused program also returns NMS-pool saturation meta
            # (n_candidates, pre_topk); exported artifacts serve depth only
            return run(weights["variables"], weights["detector_params"],
                       weights["class_table"], frames_u8)[0]

    elif isinstance(pipeline, DepthPipeline):
        if pipeline.provider is not None:
            raise ValueError(
                "DepthPipeline with a host-side object provider cannot be "
                "exported as one program; use FusedDepthPipeline (the "
                "on-device detector) or the sentinel/no-provider pipeline."
            )
        run = pipeline._build(frames_shape)
        feats, xywh, valid = pipeline._sentinel_objects(b)
        feats, xywh, valid = map(np.asarray, (feats, xywh, valid))
        weights = _canonicalize({"variables": pipeline.variables})

        def call(weights, frames_u8):
            return run(weights["variables"], frames_u8, jnp.asarray(feats),
                       jnp.asarray(xywh), jnp.asarray(valid))

    else:
        raise TypeError(f"unsupported pipeline type {type(pipeline)!r}")

    weights_avals = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), weights
    )
    exported = jax.export.export(
        jax.jit(call),
        platforms=platforms,
        disabled_checks=list(disabled_checks),
    )(weights_avals, frames_aval)
    return exported, weights


def save_artifact(path, exported, weights, extra_meta=None):
    """Write program + weights + meta into directory `path`."""
    from flax import serialization

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _PROGRAM), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(path, _WEIGHTS), "wb") as f:
        f.write(serialization.msgpack_serialize(weights))
    # in_avals is the flattened leaf list; recover the (weights, frames)
    # argument structure to find the frames aval
    (_, in_frames), _ = jax.tree_util.tree_unflatten(
        exported.in_tree, exported.in_avals
    )
    out = exported.out_avals[0]
    meta = {
        "frames_shape": list(in_frames.shape),
        "frames_dtype": str(in_frames.dtype),
        "depth_shape": list(out.shape),
        "depth_dtype": str(out.dtype),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
    }
    meta.update(extra_meta or {})
    tmp = os.path.join(path, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(path, _META))


def export_artifact(pipeline, path, batch_sizes=(8,), hw=None, *,
                    platforms=None, disabled_checks=(), extra_meta=None):
    """One-call export: compile `pipeline` for each batch size and save one
    artifact per size under `path/b{N}` (plus shared meta at `path/meta.json`
    when more than one). hw: source frame (H, W); defaults to eval_dims."""
    h, w = hw if hw is not None else pipeline.eval_dims
    dirs = []
    for b in batch_sizes:
        exported, weights = export_pipeline(
            pipeline, (b, h, w, 3), platforms=platforms,
            disabled_checks=disabled_checks,
        )
        sub = path if len(batch_sizes) == 1 else os.path.join(path, f"b{b}")
        save_artifact(sub, exported, weights, extra_meta=extra_meta)
        dirs.append(sub)
    if len(batch_sizes) > 1:
        shared = {
            "batch_sizes": [int(b) for b in batch_sizes],
            "dirs": [os.path.basename(d) for d in dirs],
            "hw": [int(h), int(w)],
        }
        shared.update(extra_meta or {})
        tmp = os.path.join(path, _META + ".tmp")
        with open(tmp, "w") as f:
            json.dump(shared, f, indent=1)
        os.replace(tmp, os.path.join(path, _META))
    return dirs


class ServingArtifact:
    """A loaded serving program: zero model code, just `jax` + the artifact.

    >>> art = ServingArtifact.load("artifact/")
    >>> depth = art(frames_u8)          # (B, H, W, 3) uint8 -> depth maps
    """

    def __init__(self, exported, weights, meta):
        self.exported = exported
        # put the restored (host numpy) weight pytree on device ONCE —
        # passing numpy leaves to the jitted call would re-transfer the
        # whole weight set host->device on every inference batch
        self.weights = jax.device_put(weights)
        self.meta = meta
        self._jitted = jax.jit(exported.call)

    @classmethod
    def load(cls, path):
        from flax import serialization

        with open(os.path.join(path, _PROGRAM), "rb") as f:
            exported = jax.export.deserialize(bytearray(f.read()))
        with open(os.path.join(path, _WEIGHTS), "rb") as f:
            weights = serialization.msgpack_restore(bytearray(f.read()))
        with open(os.path.join(path, _META)) as f:
            meta = json.load(f)
        return cls(exported, weights, meta)

    @property
    def frames_shape(self):
        return tuple(self.meta["frames_shape"])

    def __call__(self, frames_u8):
        frames = jnp.asarray(frames_u8)
        if tuple(frames.shape) != self.frames_shape:
            raise ValueError(
                f"artifact compiled for frames {self.frames_shape}, "
                f"got {tuple(frames.shape)}"
            )
        return self._jitted(self.weights, frames)
