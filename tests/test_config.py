"""Config-system tests, including loading the reference's params files
unchanged (the drop-in compatibility requirement)."""

import glob
import os

import pytest

from objcavit_tpu.config import (
    Config,
    apply_dotlist,
    check_and_validate_args,
    load_args,
    load_config,
    save_config,
)

# The full 57-file reference experiment grid is vendored under params/
# (config YAMLs are schema/constants that DEFINE the experiment axes), so the
# repo is standalone: these tests must pass with /root/reference unreadable.
PARAMS_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "params")


def test_config_access_surface():
    c = Config({"a": {"b": 1}, "model": {"name": "adabins"}, "adabins": {"x": 2}})
    assert c.a.b == 1
    assert c["a"]["b"] == 1
    assert c[c.model.name].x == 2  # the args[args.model.name] idiom
    assert "a" in c and "z" not in c
    assert c.get("z", 5) == 5
    c.a.b = 7
    assert c.to_dict()["a"]["b"] == 7


def test_dotlist_and_roundtrip(tmp_path):
    c = Config({"basic": {"batch_size": 4}})
    apply_dotlist(c, ["basic.batch_size=8", "optimizer.lr=0.001", "flag=true"])
    assert c.basic.batch_size == 8
    assert c.optimizer.lr == 0.001
    assert c.flag is True
    p = tmp_path / "cfg.yaml"
    save_config(c, p)
    assert load_config(p) == c


def test_all_reference_params_files_load_and_validate():
    """Every vendored reference experiment YAML must load + validate unchanged.

    Fails (does not skip) if the vendored grid is missing or truncated.
    """
    files = sorted(glob.glob(os.path.join(PARAMS_DIR, "*.yaml")))
    assert len(files) > 50, f"vendored params grid incomplete: {len(files)} files"
    broken = []
    for f in files:
        try:
            args = load_args(f, debug=False, validate=False, inference=False)
        except Exception:
            # a few upstream files contain invalid YAML (e.g. a stray '.'
            # line) and would fail in the reference's own loader too
            broken.append(os.path.basename(f))
            continue
        args = check_and_validate_args(
            args, basic_params_path=os.path.join(PARAMS_DIR, "basicParams.yaml")
        )
        # the selector idioms the whole framework relies on
        assert args.basic.dataset in ("nyu", "kitti")
        assert args.model.name in ("adabins", "graphbins")
        mcfg = args[args.model.name]
        assert "encoder_name" in mcfg
        assert args[args.basic.dataset].min_depth > 0
        # name defaulted from the filename
        assert args.basic.name == os.path.splitext(os.path.basename(f))[0]
        if args.model.name == "graphbins":
            assert mcfg.objcavit.positional_embedding_strategy in (
                "learned", "learned_bbox_wh", "grid_random",
                "grid_random_roi_align", "pixelwise",
            )
    assert len(broken) <= 3, f"too many unparseable reference files: {broken}"


def test_hparams_unwrap(tmp_path):
    p = tmp_path / "hparams.yaml"
    save_config(
        Config({"args": {"basic": {"dataset": "nyu", "name": "x"},
                         "paths": {}, "loss": {}, "hardware": {},
                         "nyu": {}}}), p
    )
    args = load_args(str(p))
    assert args.basic.dataset == "nyu"  # unwrapped from under 'args:'
