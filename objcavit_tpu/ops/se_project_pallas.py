"""Fused MBConv epilogue: SE gate-multiply + 1x1 project + skip-add.

The MBConv tail (reference encoder via timm `tf_efficientnet_b5_ap`,
DenseFeatureExtractor.py:141-156; our models/common.py::MBConv) ends with

    gated = dw_out * gate            # (B, H, W, M) * (B, 1, 1, M)
    y     = conv1x1(gated) + bias    # (B, H, W, O), O << M
    y     = y + x_skip               # stride-1 blocks

Hypothesis: XLA materialises `gated` (a full write + read of the expanded
M-channel tensor), so streaming dw_out ONCE — gate multiply on the VPU,
project matmul on the MXU, bias + skip-add in registers, write only the
(B, H, W, O) output — should win on the HBM-bound early stages.

MEASURED NEGATIVE (scripts/ab_se_project.py, bs=96 B5 stage shapes on a
v5e chip): 0.47x (stage0, M=24 — the narrow M wastes the 128-lane DMA
tiling), 0.70-0.91x elsewhere (all five B5 stage shapes negative). XLA's unfused schedule overlaps the
elementwise passes with neighbouring convs well enough that the saved
traffic does not pay, the same conclusion as the fused-MBConv-head
experiment (docs/PERF.md). Off by default (``ENABLE``); the kernel and its
parity tests are kept as the documented experiment.

Numerics match the unfused path at model precision: the gate multiply runs
in the model dtype, the matmul accumulates fp32 (same as XLA's conv), the
result is cast to the model dtype BEFORE the skip add (same order as the
unfused `project(...) + x`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False  # tests flip this to run the kernel on CPU
# MEASURED NEGATIVE on chip (scripts/ab_se_project.py): XLA's unfused
# mul+conv+add schedule beats this kernel at every B5 stage shape
# (0.47-0.91x, all negative). Off by default; kept as a documented experiment.
ENABLE = False


def _tiles(s: int, m: int, itemsize: int = 2) -> int:
    # keep the (T, M) input block comfortably inside a ~4 MB VMEM budget
    budget = 4 * 1024 * 1024 // max(itemsize * m, 1)
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        if t <= budget and s % t == 0:
            return t
    if s <= budget:
        return s
    # largest 8-aligned divisor under budget (rare shapes)
    for t in range(budget - budget % 8, 0, -8):
        if s % t == 0:
            return t
    return 0


def se_project_eligible(h: int, w: int, m: int, itemsize: int = 2) -> bool:
    return _tiles(h * w, m, itemsize) > 0


def _kernel_skip(x_ref, g_ref, w_ref, b_ref, s_ref, o_ref):
    x = x_ref[0]  # (T, M) model dtype
    g = g_ref[0]  # (1, M) model dtype
    w = w_ref[...]  # (M, O)
    b = b_ref[...].astype(jnp.float32)  # (1, O)
    y = jnp.dot(x * g, w, preferred_element_type=jnp.float32) + b
    o_ref[0] = y.astype(o_ref.dtype) + s_ref[0]


def _kernel_noskip(x_ref, g_ref, w_ref, b_ref, o_ref):
    x = x_ref[0]
    g = g_ref[0]
    w = w_ref[...]
    b = b_ref[...].astype(jnp.float32)
    y = jnp.dot(x * g, w, preferred_element_type=jnp.float32) + b
    o_ref[0] = y.astype(o_ref.dtype)


def se_gate_project(
    dw_out: jax.Array,  # (B, H, W, M) model dtype (post-SiLU dw output)
    gate: jax.Array,  # (B, M) SE sigmoid gate
    kernel: jax.Array,  # (M, O) folded project 1x1 kernel
    bias: jax.Array,  # (O,)
    skip: jax.Array | None = None,  # (B, H, W, O) residual input
    interpret: bool = False,
) -> jax.Array:
    b, h, w_, m = dw_out.shape
    o = kernel.shape[-1]
    if skip is not None and skip.dtype != dw_out.dtype:
        # the unfused path's promotion semantics (project(h) + x) would
        # differ; require matching dtypes rather than silently diverging
        raise ValueError(
            f"skip dtype {skip.dtype} != dw_out dtype {dw_out.dtype}"
        )
    s = h * w_
    t = _tiles(s, m, dw_out.dtype.itemsize)
    if t == 0:
        raise ValueError(f"no tile for S={s}, M={m}")
    nt = s // t
    grid = (b, nt)
    x2 = dw_out.reshape(b, s, m)
    common_in = [
        pl.BlockSpec((1, t, m), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, m), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m, o), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, o), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, t, o), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, s, o), dw_out.dtype)
    gate2 = gate.astype(dw_out.dtype).reshape(b, 1, m)
    bias2 = bias.reshape(1, o)
    if skip is not None:
        y = pl.pallas_call(
            _kernel_skip,
            out_shape=out_shape,
            grid=grid,
            in_specs=common_in + [
                pl.BlockSpec((1, t, o), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=out_spec,
            interpret=interpret,
        )(x2, gate2, kernel.astype(dw_out.dtype), bias2,
          skip.reshape(b, s, o))
    else:
        y = pl.pallas_call(
            _kernel_noskip,
            out_shape=out_shape,
            grid=grid,
            in_specs=common_in,
            out_specs=out_spec,
            interpret=interpret,
        )(x2, gate2, kernel.astype(dw_out.dtype), bias2)
    return y.reshape(b, h, w_, o)
