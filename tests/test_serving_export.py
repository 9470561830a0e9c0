"""AOT serving export: StableHLO artifacts loadable with zero model code.

The reference's only deployment path re-imports the whole repo and re-traces
the model on every process start (`/root/reference/main.py:90-116`). These
tests pin the export story: a serialized program + weights round-trips
through disk and reproduces the live pipeline bit-for-bit on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from objcavit_tpu.models import GraphBins
from objcavit_tpu.serving import DepthPipeline, FusedDepthPipeline
from objcavit_tpu.serving_export import (
    ServingArtifact,
    export_artifact,
    export_pipeline,
    save_artifact,
)

pytestmark = pytest.mark.slow  # full-model jit compile

RNG = np.random.default_rng(23)
DIMS = (64, 96)
N_OBJ = 4


def _tiny_model():
    model = GraphBins(
        encoder_name="efficientnet-tiny", n_bins=16, min_depth=0.001,
        max_depth=10.0, pos_strategy="learned_bbox_wh",
        dims_train=DIMS, dims_test=DIMS,
    )
    img = jnp.zeros((1, *DIMS, 3), jnp.float32)
    feats = jnp.zeros((1, N_OBJ, 512), jnp.float32)
    xywh = jnp.full((1, N_OBJ, 4), -1.0, jnp.float32)
    valid = jnp.zeros((1, N_OBJ), bool).at[:, 0].set(True)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), img, feats, xywh, valid
    )
    return model, variables


def test_depth_pipeline_artifact_roundtrip(tmp_path):
    model, variables = _tiny_model()
    pipe = DepthPipeline(model, variables, eval_dims=DIMS, n_obj_max=N_OBJ,
                         use_mesh=False)
    frames = RNG.integers(0, 256, (2, *DIMS, 3), dtype=np.uint8)
    want = np.asarray(pipe(frames))

    exported, weights = export_pipeline(pipe, frames.shape)
    save_artifact(tmp_path / "art", exported, weights)

    art = ServingArtifact.load(tmp_path / "art")
    got = np.asarray(art(frames))
    np.testing.assert_array_equal(got, want)

    assert art.frames_shape == frames.shape
    assert art.meta["platforms"] == [jax.default_backend()]
    assert tuple(art.meta["depth_shape"]) == want.shape
    with pytest.raises(ValueError, match="compiled for frames"):
        art(frames[:1])


def test_fused_pipeline_artifact_roundtrip(tmp_path):
    from objcavit_tpu.models.yolov7 import Yolov7Seg

    model, variables = _tiny_model()
    nc = 4
    det = Yolov7Seg(num_classes=nc)
    det_vars = jax.jit(det.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, *DIMS, 3), jnp.float32)
    )
    table = RNG.standard_normal((nc + 1, 512)).astype(np.float32)
    pipe = FusedDepthPipeline(
        model, variables, det, det_vars, table, eval_dims=DIMS,
        n_obj_max=N_OBJ, conf_thres=1e-4, det_topk=8,
    )
    frames = RNG.integers(0, 256, (2, *DIMS, 3), dtype=np.uint8)
    want = np.asarray(pipe(frames))

    (d,) = export_artifact(pipe, str(tmp_path / "fused"), batch_sizes=(2,))
    art = ServingArtifact.load(d)
    got = np.asarray(art(frames))
    np.testing.assert_array_equal(got, want)


def test_artifact_runs_without_model_modules(tmp_path):
    """The loader path must not construct any flax module: loading in a
    fresh process with only jax + flax.serialization + the artifact dir
    reproduces the program output. (Subprocess import of objcavit_tpu is
    allowed for ServingArtifact itself — the assertion is that no model
    class is instantiated, enforced by a module-level tripwire.)"""
    import subprocess
    import sys

    model, variables = _tiny_model()
    pipe = DepthPipeline(model, variables, eval_dims=DIMS, n_obj_max=N_OBJ,
                         use_mesh=False)
    frames = RNG.integers(0, 256, (1, *DIMS, 3), dtype=np.uint8)
    want = np.asarray(pipe(frames))
    exported, weights = export_pipeline(pipe, frames.shape)
    save_artifact(tmp_path / "art", exported, weights)
    np.save(tmp_path / "frames.npy", frames)
    np.save(tmp_path / "want.npy", want)

    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")  # artifact was CPU-lowered
import numpy as np
import objcavit_tpu.models as m
class _Boom:
    def __call__(self, *a, **k):
        raise AssertionError("model class constructed in loader process")
    def __getattr__(self, name):
        raise AssertionError("model class touched in loader process")
m.GraphBins = _Boom()
m.AdaBins = _Boom()
from objcavit_tpu.serving_export import ServingArtifact
art = ServingArtifact.load({str(tmp_path / 'art')!r})
frames = np.load({str(tmp_path / 'frames.npy')!r})
got = np.asarray(art(frames))
want = np.load({str(tmp_path / 'want.npy')!r})
np.testing.assert_array_equal(got, want)
print("OK")
"""
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu")  # artifact was CPU-lowered
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_export_rejects_host_provider_pipeline():
    model, variables = _tiny_model()
    pipe = DepthPipeline(
        model, variables, eval_dims=DIMS, n_obj_max=N_OBJ, use_mesh=False,
        provider=lambda x: None,
    )
    with pytest.raises(ValueError, match="host-side object provider"):
        export_pipeline(pipe, (1, *DIMS, 3))


def test_multi_batch_export_writes_shared_meta(tmp_path):
    """export_artifact's documented contract: per-size artifacts under
    path/b{N} plus a shared meta.json indexing them."""
    import json

    model, variables = _tiny_model()
    pipe = DepthPipeline(model, variables, eval_dims=DIMS, n_obj_max=N_OBJ,
                         use_mesh=False)
    dirs = export_artifact(pipe, str(tmp_path / "art"), batch_sizes=(1, 2),
                           extra_meta={"note": "x"})
    assert [d.rsplit("/", 1)[-1] for d in dirs] == ["b1", "b2"]
    shared = json.loads((tmp_path / "art" / "meta.json").read_text())
    assert shared["batch_sizes"] == [1, 2]
    assert shared["dirs"] == ["b1", "b2"]
    assert shared["hw"] == list(DIMS)
    assert shared["note"] == "x"
    art = ServingArtifact.load(tmp_path / "art" / "b2")
    frames = RNG.integers(0, 256, (2, *DIMS, 3), dtype=np.uint8)
    assert np.asarray(art(frames)).shape[0] == 2
