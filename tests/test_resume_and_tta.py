"""Full-state auto-resume, detector-recompute flip-TTA, annotation routing.

VERDICT round-1 items: kill-and-resume restores step/opt_state (not just
params); the TTA mirror pass re-runs the object provider on the flipped image
when a live detector is present (GraphBinsLM.py:173-183 re-runs the whole
forward); host-side detection annotations ride batch *meta*, never the device
batch.
"""

import pytest
import os

import numpy as np
import yaml

from objcavit_tpu.config import Config
from objcavit_tpu.training.loop import Trainer
from objcavit_tpu.training.providers import mirror_objects
from tests.test_train_loop import TINY, _make_args



pytestmark = pytest.mark.slow  # full-model jit compile

def test_kill_and_resume_restores_full_state(tmp_path):
    # phase 1: 1 epoch (8 steps on the 64-sample synthetic set)
    args = _make_args(tmp_path, **{"basic.max_epochs": 1, "debug": False})
    trainer = Trainer(args)
    state1, _ = trainer.fit()
    assert int(state1.step) == 8

    # phase 2: auto-resume into the same run dir, continue to 2 epochs
    args2 = _make_args(tmp_path, **{"basic.max_epochs": 2, "debug": False})
    args2.basic.auto_resume = True
    trainer2 = Trainer(args2)
    state2, metrics = trainer2.fit()
    assert int(state2.step) == 16  # 8 resumed + 8 new, not 16 fresh
    assert np.isfinite(metrics["abs_rel"])
    # resumed into version_0, no new version dir created
    base = os.path.join(str(tmp_path / "runs"), "tiny")
    assert sorted(os.listdir(base)) == ["version_0"]

    # optimizer state actually advanced: mu of AdamW is non-zero
    leaves = [x for x in __import__("jax").tree.leaves(state2.opt_state)]
    assert any(np.any(np.asarray(v) != 0) for v in leaves if hasattr(v, "shape"))


def test_resume_off_creates_new_version(tmp_path):
    args = _make_args(tmp_path)
    Trainer(args).fit()
    Trainer(_make_args(tmp_path)).fit()  # no auto_resume -> version_1
    base = os.path.join(str(tmp_path / "runs"), "tiny")
    assert sorted(os.listdir(base)) == ["version_0", "version_1"]


class _CentroidProvider:
    """Fake live detector: one box at the luminance centroid (continuous
    coords), so detection on the flipped image EXACTLY mirrors the box."""

    recompute_on_mirror = True

    def __init__(self, n_max=3):
        self.n_max = n_max
        self.calls = []

    def __call__(self, images):
        self.calls.append(np.array(images, copy=True))
        b, h, w = images.shape[:3]
        lum = images.sum(-1) + 1e-6
        xs = (np.arange(w) + 0.5)[None, None, :]
        ys = (np.arange(h) + 0.5)[None, :, None]
        cx = (lum * xs).sum((1, 2)) / lum.sum((1, 2))
        cy = (lum * ys).sum((1, 2)) / lum.sum((1, 2))
        xywh = np.full((b, self.n_max, 4), -1.0, np.float32)
        valid = np.zeros((b, self.n_max), bool)
        xywh[:, 0] = np.stack([cx, cy, np.full(b, 10.0), np.full(b, 8.0)], -1)
        valid[:, 0] = True
        return {
            "features": np.zeros((b, self.n_max, 512), np.float32),
            "xywh": xywh,
            "valid": valid,
        }


def test_host_hook_recomputes_mirror_with_live_detector(tmp_path):
    args = _make_args(tmp_path)
    trainer = Trainer(args)
    provider = _CentroidProvider()
    trainer.provider = provider

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (2, 16, 24, 3)).astype(np.float32)
    out = trainer._host_hook({"image": images})

    assert len(provider.calls) == 2
    np.testing.assert_array_equal(provider.calls[1], images[:, :, ::-1])
    # centroid detector: recomputed mirror == analytic mirror (x -> W - x)
    want = mirror_objects(out["objects"], images.shape[2])
    np.testing.assert_allclose(
        out["objects_mirror"]["xywh"], want["xywh"], rtol=1e-5, atol=1e-4
    )


def test_annotations_ride_meta_not_device_batch(tmp_path):
    args = _make_args(tmp_path)
    trainer = Trainer(args)

    class AnnotProvider(_CentroidProvider):
        recompute_on_mirror = False

        def __call__(self, images):
            out = super().__call__(images)
            b, h, w = images.shape[:3]
            out["_annot"] = [
                {
                    "xywh": out["xywh"][i],
                    "classes": np.zeros(self.n_max, np.int32),
                    "valid": out["valid"][i],
                    "masks": np.zeros((self.n_max, h, w), np.float32),
                }
                for i in range(b)
            ]
            return out

    trainer.provider = AnnotProvider()
    from objcavit_tpu.data import DeviceLoader, make_dataset
    from objcavit_tpu.parallel import make_mesh

    ds = make_dataset(args, "online_eval")
    loader = DeviceLoader(
        ds, 8, make_mesh(), host_hook=trainer._host_hook, synchronous=True
    )
    batch, meta = next(iter(loader))
    assert "_annot" in meta and len(meta["_annot"]) == 8
    assert "_annot" not in batch
    assert "objects" in batch and "objects_mirror" in batch

    dets = trainer._annotated_images(batch, meta)
    assert dets.shape == (8, *batch["image"].shape[1:3], 3)
    assert np.isfinite(dets).all() and dets.min() >= 0 and dets.max() <= 1


def test_prediction_figures_include_detections(tmp_path):
    from objcavit_tpu.utils.figures import save_prediction_images

    rng = np.random.default_rng(0)
    save_prediction_images(
        str(tmp_path), 3,
        rng.standard_normal((16, 24, 3)).astype(np.float32),
        rng.uniform(0.1, 9, (16, 24, 1)).astype(np.float32),
        rng.uniform(0.1, 9, (8, 12, 1)).astype(np.float32),
        min_depth=0.001,
        detections_image=rng.uniform(0, 1, (16, 24, 3)).astype(np.float32),
    )
    for suffix in ("im", "dets", "depth_gt", "depth_pred"):
        assert os.path.exists(os.path.join(str(tmp_path), f"3_{suffix}.png"))


def test_train_hook_skips_mirror(tmp_path):
    """The TRAIN loader's hook must not pay the mirror detector pass —
    only eval flip-TTA consumes objects_mirror."""
    args = _make_args(tmp_path)
    trainer = Trainer(args)
    provider = _CentroidProvider()
    trainer.provider = provider
    images = np.random.default_rng(0).uniform(0, 1, (2, 16, 24, 3)).astype(np.float32)
    out = trainer._train_hook({"image": images})
    assert "objects" in out and "objects_mirror" not in out
    assert len(provider.calls) == 1  # single detector pass


def test_best_metric_survives_manager_restart(tmp_path):
    """Auto-resume must not let a worse post-resume validation clobber
    'best' (best_metric persisted in checkpoints/meta.json)."""
    import jax.numpy as jnp

    from objcavit_tpu.training.checkpoint import CheckpointManager

    state = {"w": jnp.ones(3)}
    m1 = CheckpointManager(str(tmp_path))
    m1.save(state, abs_rel=0.105)
    m2 = CheckpointManager(str(tmp_path))  # a resumed process
    assert m2.best_metric == 0.105
    m2.save({"w": jnp.zeros(3)}, abs_rel=0.14)  # worse -> must NOT become best
    best = CheckpointManager(str(tmp_path)).restore(
        str(tmp_path / "checkpoints" / "best"), target=state
    )
    np.testing.assert_array_equal(np.asarray(best["w"]), np.ones(3))


def test_swa_average_persists(tmp_path):
    import jax.numpy as jnp

    from objcavit_tpu.training.checkpoint import CheckpointManager

    m = CheckpointManager(str(tmp_path))
    m.save_swa({"w": jnp.full(3, 2.5)}, swa_count=5)
    got = CheckpointManager(str(tmp_path)).restore_swa({"w": jnp.zeros(3)})
    assert got is not None
    params, count = got
    assert count == 5
    np.testing.assert_allclose(np.asarray(params["w"]), 2.5)


def test_swa_resume_discards_average_ahead_of_state(tmp_path):
    """A kill between save_swa and the 'last' checkpoint save leaves an SWA
    average recorded AHEAD of the restorable state; resuming must discard it
    (re-run epochs would be double-counted in the running average)."""
    import jax.numpy as jnp

    from objcavit_tpu.training.checkpoint import CheckpointManager

    m = CheckpointManager(str(tmp_path))
    m.save_swa({"w": jnp.full(3, 2.5)}, swa_count=5, step=120)
    fresh = CheckpointManager(str(tmp_path))
    # restored 'last' state sits at step 100 < the SWA's 120 -> discard
    assert fresh.restore_swa({"w": jnp.zeros(3)}, max_step=100) is None
    # at or past the recorded step the average is valid
    got = fresh.restore_swa({"w": jnp.zeros(3)}, max_step=120)
    assert got is not None and got[1] == 5


def test_meta_json_write_is_atomic(tmp_path):
    """meta.json updates go through a temp file + os.replace; a pre-existing
    good meta must never be readable as truncated mid-write."""
    import json
    import os

    from objcavit_tpu.training.checkpoint import CheckpointManager

    m = CheckpointManager(str(tmp_path))
    m._write_meta(best_metric=0.25)
    m._write_meta(swa_count=3)  # second write merges, atomically
    path = m._meta_path()
    with open(path) as f:
        meta = json.load(f)
    assert meta == {"best_metric": 0.25, "swa_count": 3}
    assert not os.path.exists(path + ".tmp")
    assert CheckpointManager(str(tmp_path)).best_metric == 0.25
