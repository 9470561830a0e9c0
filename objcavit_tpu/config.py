"""Config system: OmegaConf-compatible YAML tree + reference CLI semantics.

The reference drives everything from OmegaConf YAML trees accessed as
``args.basic.dataset`` / ``args[args.model.name]`` (main.py:161-186,
misc_utils.py:10-50). omegaconf is not available in this image, so ``Config``
is a small dict wrapper with the same access surface (attribute access,
item access, ``get``, ``in``, ``keys``), able to load the reference's params
files unchanged — including the ``args:`` unwrap used by auto-saved
hparams.yaml files (main.py:162-163).

``check_and_validate_args`` replicates misc_utils.py:10-50: name defaulting
from the config filename, required-section asserts, eval-time checkpoint
autodiscovery (newest ``*last.ckpt`` file or ``*last`` orbax directory), and
the nyu/kitti section override from params/basicParams.yaml.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path
from typing import Iterator

import yaml


class Config:
    """Attribute/item-access view over a nested dict (OmegaConf-alike)."""

    def __init__(self, data: dict | None = None):
        object.__setattr__(self, "_data", {})
        if data:
            for k, v in data.items():
                self[k] = v

    # -- core access --------------------------------------------------------
    def __getattr__(self, key: str):
        try:
            return self._data[key]
        except KeyError:
            raise AttributeError(key) from None

    def __setattr__(self, key: str, value):
        self[key] = value

    def __getitem__(self, key: str):
        return self._data[key]

    def __setitem__(self, key: str, value):
        if isinstance(value, dict):
            value = Config(value)
        self._data[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __eq__(self, other) -> bool:
        if isinstance(other, Config):
            return self.to_dict() == other.to_dict()
        if isinstance(other, dict):
            return self.to_dict() == other
        return NotImplemented

    def __repr__(self) -> str:
        return f"Config({self._data!r})"

    def get(self, key: str, default=None):
        return self._data.get(key, default)

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def setdefault(self, key: str, value):
        if key not in self._data:
            self[key] = value
        return self._data[key]

    def to_dict(self) -> dict:
        out = {}
        for k, v in self._data.items():
            out[k] = v.to_dict() if isinstance(v, Config) else v
        return out

    def merge(self, other: "Config | dict") -> None:
        """Deep merge ``other`` into self (other wins)."""
        items = other.items() if isinstance(other, (Config, dict)) else ()
        for k, v in items:
            if (
                k in self._data
                and isinstance(self._data[k], Config)
                and isinstance(v, (Config, dict))
            ):
                self._data[k].merge(v)
            else:
                self[k] = v.to_dict() if isinstance(v, Config) else v


def load_config(path: str | Path) -> Config:
    with open(path, "r", encoding="utf-8") as f:
        data = yaml.safe_load(f) or {}
    return Config(data)


def save_config(cfg: Config, path: str | Path) -> None:
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)


def apply_dotlist(cfg: Config, overrides: list[str]) -> None:
    """OmegaConf-style 'a.b.c=value' CLI overrides."""
    for item in overrides:
        key, _, raw = item.partition("=")
        value = yaml.safe_load(raw)
        node = cfg
        parts = key.strip().split(".")
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], Config):
                node[p] = {}
            node = node[p]
        node[parts[-1]] = value


def get_latest_checkpoint(args: Config, directory: str | None = None) -> str:
    """Newest '*last.ckpt' file or '*last' orbax dir under the run dir
    (misc_utils.py:62-72 plus orbax-native checkpoints)."""
    dir_to_check = (
        directory
        if directory is not None
        else os.path.join(args.paths.run_dir, args.basic.name)
    )
    candidates = [p for p in Path(dir_to_check).rglob("*last.ckpt") if p.is_file()]
    candidates += [p for p in Path(dir_to_check).rglob("*last") if p.is_dir()]
    if not candidates:
        sys.exit("Error: no checkpoints found for this parameter file.")
    return str(max(candidates, key=lambda p: p.stat().st_ctime))


def check_and_validate_args(
    args: Config, basic_params_path: str = "params/basicParams.yaml"
) -> Config:
    """Reference misc_utils.check_and_validate_args semantics."""
    if "name" not in args.basic or args.basic.get("name") in (None, "None", "none", ""):
        args.basic.name = os.path.splitext(os.path.basename(args.config_file))[0]

    assert all(k in args.keys() for k in ("basic", "paths", "loss", "hardware"))
    assert args.basic.dataset in args.keys()

    if args.get("validate") or args.get("inference"):
        if args.basic.get("val_checkpoint") is None:
            if os.path.basename(args.config_file) == "hparams.yaml":
                args.basic.val_checkpoint = get_latest_checkpoint(
                    args, directory=os.path.dirname(args.config_file)
                )
            else:
                args.basic.val_checkpoint = get_latest_checkpoint(args)

        if os.path.basename(args.config_file) == "hparams.yaml":
            args.val_output_dir = os.path.dirname(args.config_file)
        else:
            args.val_output_dir = os.path.dirname(
                os.path.dirname(args.basic.val_checkpoint)
            )

        if args.get("inference"):
            args.predict_output_dir = os.path.join(args.val_output_dir, "predict_output")
            os.makedirs(args.predict_output_dir, exist_ok=True)

        # legacy-config shim: dataset sections always taken from basicParams
        # (misc_utils.py:41-48)
        if os.path.exists(basic_params_path):
            override = load_config(basic_params_path)
            args.nyu = override.nyu
            args.kitti = override.kitti

    return args


def load_args(config_file: str, **cli_flags) -> Config:
    """Load a params file the way main.py does, incl. the hparams unwrap."""
    args = load_config(config_file)
    if "args" in args:
        args = args.args  # auto-saved hparams.yaml files nest under 'args'
    args.config_file = config_file
    for k, v in cli_flags.items():
        args[k] = v
    return args
