#!/usr/bin/env python
"""CLI entry point — drop-in compatible with the reference's main.py.

    python main.py -c params/<cfg>.yaml            # train
    python main.py -c params/<cfg>.yaml -v         # validate latest ckpt
    python main.py -c params/<cfg>.yaml -i         # inference / predict
    ... [--debug] [--log_debug]

Thin shim over objcavit_tpu.cli (the installable entry point) that pins the
repo checkout's params/basicParams.yaml for the legacy-config override
(reference misc_utils.py:41-48). Reference: main.py:140-187.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from objcavit_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    main(
        basic_params_path=os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "params", "basicParams.yaml",
        )
    )
