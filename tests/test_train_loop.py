"""End-to-end train/val/predict on the 8-device CPU mesh with synthetic data."""

import os

import numpy as np
import pytest
import yaml

import jax

from objcavit_tpu.config import Config
from objcavit_tpu.training.loop import Trainer

# tiny-but-real config: b1 encoder, dims divisible by 32 and by 2*16

pytestmark = pytest.mark.slow  # full-model jit compile

TINY = {
    "basic": {
        "dataset": "nyu", "batch_size": 8, "max_epochs": 1,
        "validate_every": 1, "use_adabins_dataloader": True, "name": "tiny",
    },
    "optimizer": {
        "name": "adamw", "lr": 3.57e-4, "wd": 0.1, "div_factor": 25,
        "final_div_factor": 100, "gradient_clip_val": 0.1,
    },
    "model": {"name": "graphbins"},
    "graphbins": {
        "n_bins": 16, "slow_encoder": 10, "encoder_name": "efficientnet-tiny",
        "yolov7_chkpt": "none",
        "objcavit": {
            "positional_embedding_strategy": "learned_bbox_wh",
            "embedding_dim": 128,
            "obj_language_strategy": "none",
            "language_embedding_strategy": "control_obj_zeros_512",
        },
    },
    "adabins": {"n_bins": 16, "encoder_name": "efficientnet-tiny"},
    "loss": {"names": ["silog", "bins_chamfer"], "coeffs": [1, 0.1]},
    "paths": {"data_dir": "/nonexistent", "run_dir": None},  # -> synthetic data
    "nyu": {
        "filenames_file_train": "/nonexistent", "filenames_file_eval": "/nonexistent",
        "base_path": "nyu", "train_path": "sync", "eval_path": "t",
        "image_norm_factor": 255.0, "depth_norm_factor": 1000.0,
        "min_depth": 0.001, "max_depth": 10, "eigen_crop": False,
        "garg_crop": False, "do_kb_crop": False, "do_random_rotate": True,
        "degree": 2.5, "dimensions_train": [64, 96], "dimensions_test": [64, 96],
    },
    "hardware": {"num_workers": 0},
    "debug": True,
    "objects_max": 3,
}


def _make_args(tmp_path, **overrides):
    cfg = yaml.safe_load(yaml.safe_dump(TINY))  # deep copy
    args = Config(cfg)
    args.paths.run_dir = str(tmp_path / "runs")
    for k, v in overrides.items():
        node = args
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return args


def test_fit_one_debug_epoch_graphbins(tmp_path):
    args = _make_args(tmp_path)
    trainer = Trainer(args)
    state, metrics = trainer.fit()
    assert int(state.step) == 1
    assert np.isfinite(metrics["abs_rel"])
    # run dir artifacts: hparams snapshot + checkpoints
    run = os.path.join(str(tmp_path / "runs"), "tiny", "version_0")
    assert os.path.exists(os.path.join(run, "hparams.yaml"))
    assert os.path.isdir(os.path.join(run, "checkpoints", "last"))


def test_fit_adabins_and_validate(tmp_path):
    args = _make_args(tmp_path, **{"model.name": "adabins"})
    trainer = Trainer(args)
    state, metrics = trainer.fit()
    assert np.isfinite(metrics["abs_rel"])

    # validate flow against the saved checkpoint
    args2 = _make_args(tmp_path, **{"model.name": "adabins"})
    args2.validate = True
    args2.basic.val_checkpoint = os.path.join(
        str(tmp_path / "runs"), "tiny", "version_0", "checkpoints", "last"
    )
    args2.val_output_dir = str(tmp_path / "val_out")
    m = Trainer(args2).validate()
    out = os.path.join(str(tmp_path / "val_out"), "validation_output.txt")
    assert os.path.exists(out)
    text = open(out).read()
    assert "abs_rel" in text and "==#==" in text
    assert np.isfinite(m["rmse"])


def test_batch_is_sharded_over_mesh(tmp_path):
    args = _make_args(tmp_path)
    from objcavit_tpu.data import DeviceLoader, make_dataset
    from objcavit_tpu.parallel import make_mesh

    mesh = make_mesh()
    assert mesh.devices.size == 8
    ds = make_dataset(args, "train")
    loader = DeviceLoader(ds, 8, mesh)
    batch, _ = next(iter(loader))
    # image batch dim is split over the 8 virtual devices
    assert len(batch["image"].sharding.device_set) == 8
