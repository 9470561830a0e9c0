"""Multi-process launch path (VERDICT r4 missing #2 / next-round #3).

The reference scales by Lightning spawning one process per GPU under DDP
(main.py:66,104,129-131); SURVEY §5 names jax.distributed.initialize as the
TPU equivalent. Pinned here:

  * env-arg resolution (all-or-nothing OBJCAVIT_* triple),
  * the per-process feeding shim's degenerate single-process case
    (shard_host_local_batch == shard_batch, value-exact),
  * the DistributedSampler-style index interleave (disjoint cover),
  * a REAL 2-process run over localhost (slow): jax.distributed.initialize
    with the CPU gloo collectives backend, a global 8-device mesh spanning
    both processes, global-array assembly from process-local shards, a
    cross-process collective, and the metric sync that backs the
    torchmetrics-DDP parity (reference metrics/AbsRel.py:42-43).
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from objcavit_tpu.parallel import (
    make_mesh,
    process_local_indices,
    resolve_distributed_args,
    shard_batch,
    shard_host_local_batch,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_resolve_distributed_args():
    assert resolve_distributed_args({}) is None
    full = {
        "OBJCAVIT_COORDINATOR": "10.0.0.1:1234",
        "OBJCAVIT_NUM_PROCESSES": "4",
        "OBJCAVIT_PROCESS_ID": "2",
    }
    got = resolve_distributed_args(full)
    assert got == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 2,
    }
    with pytest.raises(ValueError, match="partial"):
        resolve_distributed_args({"OBJCAVIT_COORDINATOR": "x:1"})
    with pytest.raises(ValueError, match="outside"):
        resolve_distributed_args({**full, "OBJCAVIT_PROCESS_ID": "4"})


def test_initialize_noop_without_env(monkeypatch):
    from objcavit_tpu.parallel import initialize_distributed

    for k in ("OBJCAVIT_COORDINATOR", "OBJCAVIT_NUM_PROCESSES",
              "OBJCAVIT_PROCESS_ID"):
        monkeypatch.delenv(k, raising=False)
    assert initialize_distributed() is False  # strict no-op single-host


def test_process_local_indices_disjoint_cover():
    idxs = np.arange(24)
    parts = [process_local_indices(idxs, p, 3) for p in range(3)]
    assert all(len(p) == 8 for p in parts)
    assert sorted(np.concatenate(parts).tolist()) == idxs.tolist()
    # the interleave, not contiguous blocks (DistributedSampler semantics)
    assert parts[1][0] == 1 and parts[2][0] == 2


def test_shard_host_local_batch_degenerate_single_process():
    mesh = make_mesh(n_data=jax.device_count())
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.uniform(0, 1, (8, 4, 4, 3)).astype(np.float32),
        "sample_valid": np.ones((8,), bool),
        "odd": rng.uniform(0, 1, (3, 2)).astype(np.float32),  # replicated
    }
    a = shard_host_local_batch(mesh, batch)
    b = shard_batch(mesh, batch)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding == b[k].sharding, k


_WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); n_proc = int(sys.argv[2]); port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from objcavit_tpu.parallel import (
        initialize_distributed, is_main_process, make_mesh,
        process_local_indices, shard_host_local_batch,
    )
    assert initialize_distributed(f"127.0.0.1:{port}", n_proc, pid)
    assert jax.process_count() == n_proc and jax.device_count() == 4 * n_proc
    assert is_main_process() == (pid == 0)

    import numpy as np
    import jax.numpy as jnp
    mesh = make_mesh()  # global mesh over both processes' devices
    assert mesh.devices.size == 4 * n_proc

    # per-process feeding: each process holds its [pid::P] interleave of one
    # global 8-row batch; the assembled global array must reduce to the
    # global batch's own sum (cross-process collective over gloo)
    global_batch = np.arange(8 * 5, dtype=np.float32).reshape(8, 5)
    local = global_batch[process_local_indices(np.arange(8), pid, n_proc)]
    arr = shard_host_local_batch(mesh, {"x": local})["x"]
    assert arr.shape == (8, 5), arr.shape
    from jax.sharding import NamedSharding, PartitionSpec as P
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    np.testing.assert_allclose(float(total), global_batch.sum())

    # metric sync across the global mesh (torchmetrics-DDP parity collective)
    from objcavit_tpu.metrics import (
        metrics_compute, metrics_init, metrics_sync, metrics_update,
    )
    pred = shard_host_local_batch(
        mesh, {"p": local[:, :4].reshape(-1, 2, 2, 1) * 0.01 + 1.0})["p"]
    gt = shard_host_local_batch(
        mesh, {"g": local[:, :4].reshape(-1, 2, 2, 1) * 0.01 + 1.1})["g"]
    state = metrics_update(metrics_init(), pred, gt,
                           jnp.ones_like(gt, dtype=bool))
    stacked = jax.tree.map(lambda x: jnp.broadcast_to(x, (mesh.devices.size,)),
                           state)
    m = metrics_compute(metrics_sync(stacked, mesh))
    assert np.isfinite(float(m["abs_rel"]))
    print(f"OK {pid} abs_rel={float(m['abs_rel']):.6f}", flush=True)
""")


@pytest.mark.slow
def test_two_process_distributed_run(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {
        k: v for k, v in os.environ.items()
        if "xla_force_host_platform_device_count" not in v
        or k != "XLA_FLAGS"
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(p), "2", str(port)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for p in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
    lines = sorted(o.strip().splitlines()[-1] for o, _ in outs)
    assert lines[0].startswith("OK 0") and lines[1].startswith("OK 1"), lines
    # both processes computed the SAME synced metric (replicated result)
    assert lines[0].split("abs_rel=")[1] == lines[1].split("abs_rel=")[1]


_FIT_WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); n_proc = int(sys.argv[2]); port = sys.argv[3]
    run_dir = sys.argv[4]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from objcavit_tpu.parallel import initialize_distributed
    assert initialize_distributed(f"127.0.0.1:{port}", n_proc, pid)

    import numpy as np
    import yaml
    from objcavit_tpu.config import Config
    from objcavit_tpu.training.loop import Trainer
    from tests.test_train_loop import TINY

    cfg = yaml.safe_load(yaml.safe_dump(TINY))
    cfg["paths"]["run_dir"] = run_dir
    args = Config(cfg)
    t = Trainer(args)
    state, metrics = t.fit()
    assert int(state.step) == 1
    assert np.isfinite(metrics["abs_rel"])
    print(f"OK {pid} step={int(state.step)} abs_rel={metrics['abs_rel']:.6f}",
          flush=True)
""")


@pytest.mark.slow
def test_two_process_fit_end_to_end(tmp_path):
    """The WHOLE training loop under a 2-process global mesh: per-process
    data loading (DeviceLoader interleave + shard_host_local_batch), the
    sharded train step with cross-process gradient collectives, in-fit
    validation with metric sync, collective orbax checkpointing with
    rank-zero meta/hparams writes, and the race-safe run-dir agreement."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "fit_worker.py"
    script.write_text(_FIT_WORKER)
    run_dir = str(tmp_path / "runs")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(p), "2", str(port), run_dir],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for p in range(2)
    ]
    outs = [p.communicate(timeout=960) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"fit worker failed:\n{out}\n{err[-4000:]}"
    lines = sorted(o.strip().splitlines()[-1] for o, _ in outs)
    assert lines[0].startswith("OK 0") and lines[1].startswith("OK 1"), lines
    # same replicated metrics on both ranks
    assert lines[0].split("abs_rel=")[1] == lines[1].split("abs_rel=")[1]
    # ONE version dir (no race), with rank-zero artifacts + the checkpoint
    base = os.path.join(run_dir, "tiny")
    versions = sorted(os.listdir(base))
    assert versions == ["version_0"], versions
    v0 = os.path.join(base, "version_0")
    assert os.path.exists(os.path.join(v0, "hparams.yaml"))
    assert os.path.isdir(os.path.join(v0, "checkpoints", "last"))
