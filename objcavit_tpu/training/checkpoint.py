"""Orbax checkpointing: best-by-abs_rel + last, with config snapshots.

Mirrors the reference's Lightning ModelCheckpoint(monitor='metrics/abs_rel',
save_last=True, save_top_k=1, mode='min') (main.py:120) and the hparams.yaml
auto-save (GraphBinsLM.py:40) whose nested 'args:' layout our config loader
understands (main.py:162-163).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp

from objcavit_tpu.config import Config, save_config


class CheckpointManager:
    def __init__(self, run_dir: str):
        self.run_dir = os.path.abspath(run_dir)
        os.makedirs(self.run_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        # best-metric survives process restarts (auto-resume must not let the
        # first post-resume validation clobber a better 'best' checkpoint)
        self.best_metric = float(self._meta().get("best_metric", float("inf")))

    def _meta_path(self) -> str:
        return os.path.join(self.run_dir, "checkpoints", "meta.json")

    def _meta(self) -> dict:
        import json

        try:
            with open(self._meta_path()) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def _write_meta(self, **updates) -> None:
        import json

        from objcavit_tpu.parallel.distributed import is_main_process

        if not is_main_process():
            # multihost: orbax saves are collective (every process calls
            # them) but meta.json is a plain file — rank-zero writes it
            return
        meta = self._meta()
        meta.update(updates)
        path = self._meta_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # atomic: a crash mid-write must not leave a truncated meta.json
        # (which _meta() treats as {} — resetting best_metric to inf would
        # let a worse validation clobber the 'best' checkpoint)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, path)

    def save_hparams(self, args: Config) -> None:
        wrapped = Config({"args": args.to_dict()})
        save_config(wrapped, os.path.join(self.run_dir, "hparams.yaml"))

    def save(self, state: Any, abs_rel: float | None = None) -> None:
        ckpt_dir = os.path.join(self.run_dir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        last = os.path.join(ckpt_dir, "last")
        self._ckptr.save(last, state, force=True)
        if abs_rel is not None and abs_rel < self.best_metric:
            self.best_metric = abs_rel
            self._ckptr.save(os.path.join(ckpt_dir, "best"), state, force=True)
            self._write_meta(best_metric=float(abs_rel))
        self._ckptr.wait_until_finished()

    def save_swa(self, swa_params: Any, swa_count: int, step: int = 0) -> None:
        """Persist the SWA running average so auto-resume keeps averaging
        from where the killed run stopped (not from the resume epoch).
        ``step`` records the train step the average corresponds to."""
        ckpt_dir = os.path.join(self.run_dir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        self._ckptr.save(os.path.join(ckpt_dir, "swa"), swa_params, force=True)
        self._write_meta(swa_count=int(swa_count), swa_step=int(step))
        self._ckptr.wait_until_finished()

    def restore_swa(self, target: Any, max_step: int | None = None):
        """Returns (params, count) or None. An SWA average recorded AHEAD of
        the restored train state (kill landed between save_swa and the 'last'
        checkpoint save) is discarded — re-run epochs would otherwise be
        double-counted in the running average."""
        path = os.path.join(self.run_dir, "checkpoints", "swa")
        meta = self._meta()
        count = int(meta.get("swa_count", 0))
        if count <= 0 or not os.path.isdir(path):
            return None
        if max_step is not None and int(meta.get("swa_step", 0)) > int(max_step):
            return None
        return self._ckptr.restore(path, target=target), count

    def restore(self, path: str, target: Any) -> Any:
        return self._ckptr.restore(os.path.abspath(path), target=target)


def restore_checkpoint(path: str, target: Any = None, args: Any = None) -> Any:
    """Restore either an orbax dir ('*last'/'best') or a reference torch
    '.ckpt' file (converted via utils/torch_import). With target=None the
    stored pytree comes back as nested dicts."""
    if path.endswith(".ckpt"):
        from objcavit_tpu.utils.torch_import import load_torch_checkpoint

        return load_torch_checkpoint(path, args)
    if target is None:
        return ocp.StandardCheckpointer().restore(os.path.abspath(path))
    return ocp.StandardCheckpointer().restore(os.path.abspath(path), target=target)
