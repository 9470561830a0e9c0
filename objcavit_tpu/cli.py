"""CLI entry point — drop-in compatible with the reference's main.py.

    python main.py -c params/<cfg>.yaml            # train
    python main.py -c params/<cfg>.yaml -v         # validate latest ckpt
    python main.py -c params/<cfg>.yaml -i         # inference / predict
    ... [--debug] [--log_debug] [--bf16] [--resume/--no-resume]

or, installed (``pip install -e .``), the same flags via ``objcavit-tpu``.

Accepts the reference's params YAML files unchanged (including auto-saved
hparams.yaml files via the 'args:' unwrap). Reference: main.py:140-187.
The legacy-config override needs ``basicParams.yaml``
(check_and_validate_args; reference misc_utils.py:41-48) — resolved from
``basic_params_path`` (the repo-checkout ``main.py`` passes its own
``params/`` dir), else the directory of the ``-c`` config file, else
``$OBJCAVIT_PARAMS_DIR``.
"""

from __future__ import annotations

import argparse
import logging
import os

from objcavit_tpu.config import check_and_validate_args, load_args


def _resolve_basic_params(config_file: str, explicit: str | None) -> str:
    if explicit:
        return explicit
    candidates = [
        os.path.join(os.path.dirname(os.path.abspath(config_file)),
                     "basicParams.yaml"),
    ]
    env_dir = os.environ.get("OBJCAVIT_PARAMS_DIR")
    if env_dir:
        candidates.append(os.path.join(env_dir, "basicParams.yaml"))
    for c in candidates:
        if os.path.exists(c):
            return c
    return candidates[0]  # check_and_validate_args handles absence


def main(basic_params_path: str | None = None):
    parser = argparse.ArgumentParser(description="")
    parser.add_argument(
        "-c", "--config_file", required=True,
        help="Path to the config/params YAML file.",
    )
    parser.add_argument(
        "-v", "--validate", action="store_true",
        help="Run validation with the latest (or configured) checkpoint; "
             "one device, batch size 1.",
    )
    parser.add_argument(
        "-i", "--inference", action="store_true",
        help="Run inference: per-image predictions, figures, metrics CSV.",
    )
    parser.add_argument(
        "--debug", action="store_true",
        help="Debug mode: 1 batch / 1 epoch, synthetic-friendly.",
    )
    parser.add_argument("--log_debug", action="store_true", help="DEBUG log level.")
    parser.add_argument(
        "--bf16", action="store_true",
        help="bfloat16 compute (TPU-native speed; fp32 is the parity default).",
    )
    parser.add_argument(
        "--resume", action=argparse.BooleanOptionalAction, default=None,
        help="Auto-resume: continue the newest run with a 'last' checkpoint, "
             "restoring the FULL train state (params, optimizer, step). "
             "--no-resume forces a fresh version dir even when the config "
             "sets basic.auto_resume.",
    )
    cl = parser.parse_args()

    args = load_args(
        cl.config_file,
        debug=cl.debug,
        log_debug=cl.log_debug,
        validate=cl.validate,
        inference=cl.inference,
    )
    assert not (args.get("validate") and args.get("inference"))
    args.devices = 1 if cl.debug or cl.validate or cl.inference else None
    args.hardware.num_workers = 0 if cl.debug else args.hardware.num_workers

    basic_params = _resolve_basic_params(cl.config_file, basic_params_path)
    args = check_and_validate_args(args, basic_params_path=basic_params)

    logging.basicConfig(
        level=logging.DEBUG if args.get("log_debug") else logging.INFO,
        force=True,
        format="[%(levelname)s][%(name)s] %(message)s",
    )
    logging.info("Starting (model=%s dataset=%s name=%s)",
                 args.model.name, args.basic.dataset, args.basic.name)

    # multi-host launch: join the slice described by OBJCAVIT_COORDINATOR /
    # _NUM_PROCESSES / _PROCESS_ID (no-op when unset — single host). Must
    # run before the first backend use. The reference's analogue is
    # Lightning DDP's per-GPU process spawn (main.py:129-131); here one
    # process drives each HOST's chips. See docs/MIGRATION.md.
    from objcavit_tpu.parallel.distributed import initialize_distributed

    if initialize_distributed():
        import jax

        logging.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )

    import jax.numpy as jnp

    from objcavit_tpu.training.loop import Trainer

    dtype = jnp.bfloat16 if cl.bf16 else jnp.float32
    trainer = Trainer(args, dtype=dtype)
    if args.get("validate"):
        logging.info("==== RUNNING VALIDATION ====")
        trainer.validate()
    elif args.get("inference"):
        logging.info("==== RUNNING INFERENCE ====")
        trainer.predict()
    else:
        trainer.fit(resume=cl.resume)


if __name__ == "__main__":
    main()
