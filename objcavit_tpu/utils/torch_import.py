"""PyTorch-checkpoint import: Lightning .ckpt state_dict -> JAX param pytree.

Maps the reference's torch module tree (modules/GraphBinsLM.py et al.) onto
this framework's flax parameter tree so released checkpoints evaluate here.

Weight layout conventions:
  * Linear: torch (out, in) -> flax kernel (in, out)  [transpose]
  * Conv2d: torch OIHW -> flax HWIO                    [transpose 2,3,1,0]
  * BatchNorm: weight/bias -> scale/bias; running stats -> batch_stats
  * MultiheadAttention: in_proj_weight (3E, E) -> in_proj_kernel (E, 3E)

The full per-model key mapping lands with the checkpoint-parity milestone;
until then this module exposes the primitive converters + a loader that
raises a clear error for unmapped keys.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def t_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def t_dwconv(w: np.ndarray) -> np.ndarray:
    """torch depthwise (C,1,kh,kw) -> flax HWIO (kh,kw,1,C)."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def load_torch_checkpoint(path: str, target: Any) -> Any:
    raise NotImplementedError(
        "Torch .ckpt import requires the released checkpoint file, which is "
        "not present in this image. The converter primitives are in "
        "objcavit_tpu/utils/torch_import.py; wire the per-model key mapping "
        "when a checkpoint is available."
    )
def load_yolov7_weights(checkpoint, model):
    raise NotImplementedError(
        'YOLOv7 weight import requires the LVIS checkpoint file (not present '
        'in this image); see load_torch_checkpoint for the mapping primitives.'
    )
