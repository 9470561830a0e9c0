"""CLI smoke test: `python main.py -c <cfg> --debug` as a real subprocess.

Covers the layer the programmatic Trainer tests skip — argparse wiring
(main.py:23-93), load_args' CLI-flag merge, check_and_validate_args with the
repo's params/basicParams.yaml, logging init — end to end against the same
tiny synthetic-data config the train-loop tests use (reference contract:
main.py:140-187)."""

import os
import subprocess
import sys

import pytest
import yaml

from tests.test_train_loop import TINY

pytestmark = pytest.mark.slow  # subprocess pays a fresh jax import + compile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    # reuse the suite's persistent compile cache (tests/conftest.py)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    return env


def test_main_debug_fit_subprocess(tmp_path):
    cfg = yaml.safe_load(yaml.safe_dump(TINY))
    del cfg["debug"]  # --debug must arrive via the CLI flag, that's the test
    del cfg["basic"]["name"]  # must default from the config FILENAME
    cfg["paths"]["run_dir"] = str(tmp_path / "runs")
    cfg_path = tmp_path / "tiny_cli.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    proc = subprocess.run(
        [sys.executable, "main.py", "-c", str(cfg_path), "--debug"],
        cwd=REPO,
        env=_cpu_env(),
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"CLI fit failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    # name defaulted from the config FILENAME (misc_utils.py:14-15 semantics)
    run = os.path.join(str(tmp_path / "runs"), "tiny_cli", "version_0")
    assert os.path.exists(os.path.join(run, "hparams.yaml")), proc.stderr
    assert os.path.isdir(os.path.join(run, "checkpoints", "last")), proc.stderr
