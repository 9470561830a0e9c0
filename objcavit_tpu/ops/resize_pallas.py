"""One-pass Pallas bilinear resize (torch align_corners semantics), NHWC.

WHY. The decoder's four `align_corners=True` up-resizes cost ~43 ms of the
bs=96 flagship forward at 0.6-19.6% MFU (docs/PERF.md): the separable
einsum formulation lowers each pass to dot_general + a FULL MINOR-DIM
TRANSPOSE of the output, and the transposes dominate. Reformulating the
einsums doesn't help (XLA re-canonicalises) and gather+lerp measures 3.5x
worse (`scripts/ab_resize.py`). This kernel produces the output directly
in NHWC layout — no transposes:

  grid (B, Ho/TR); per step DMA the input row-slab the band needs (row
  taps are monotone, so the slab is a static-size dynamic-offset slice),
  H-interpolate each output row as a 2-tap lerp (VPU, per-row scalar
  weights from SMEM tables), and W-interpolate with ONE per-row MXU
  matmul against the dense (Wo, Wi) interpolation matrix — 2 nonzeros
  per row make it FLOP-bloated but it rides the MXU and lands the row in
  (Wo, C) layout natively.

Same tap indices/weights as ops/resize.py::_interp_matrix (shared helper),
so the math matches the shipped einsum path. Inference-only; the decoder
uses it on its declared-fast bf16 path, parity pinned in
tests/test_resize_pallas.py and the on-chip win in scripts/ab_resize.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from objcavit_tpu.ops.resize import _interp_matrix, _interp_taps

_VMEM_BUDGET = 10 * 1024 * 1024

# Tests flip this to exercise the wired decoder path in interpreter mode.
INTERPRET = False


def _plan(hi: int, wi: int, c: int, ho: int, wo: int):
    """(TR, TRS): output band rows and static input slab rows, or None."""
    wi8 = -(-wi // 8) * 8  # W zero-padded to the DMA sublane tiling
    for tr in (16, 15, 12, 10, 8, 6, 5, 4, 3, 2):
        if ho % tr:
            continue
        lo, hi_i, _ = _interp_taps(hi, ho, True)
        # max input rows any band of tr output rows touches
        trs = 0
        for b0 in range(0, ho, tr):
            lo0 = int(lo[b0])
            hi1 = int(hi_i[b0 + tr - 1])
            trs = max(trs, hi1 - lo0 + 1)
        trs = min(trs + 1, hi)  # +1 slack for the hi tap, capped at Hi
        slab = trs * wi8 * c * 2
        out = 2 * tr * wo * c * 2
        mw = wo * wi8 * 2
        if slab + out + mw <= _VMEM_BUDGET:
            return tr, trs
    return None


def resize_eligible(hi: int, wi: int, c: int, ho: int, wo: int) -> bool:
    return (
        ho > hi and wo > wi and hi > 1 and wi > 1
        # Mosaic DMA slices must be lane-tile-aligned (W is zero-padded to
        # the sublane tiling inside resize_bilinear_pallas — exact, the
        # interp matrix gets zero columns)
        and c % 128 == 0
        and _plan(hi, wi, c, ho, wo) is not None
    )


def _kernel(start_ref, llo_ref, lhi_ref, frac_ref, x_hbm, mw_ref, y_ref,
            slab_ref, dma_sem, *, tr, trs, wo, c):
    bi = pl.program_id(0)
    band = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(start_ref[band], trs)], slab_ref, dma_sem
    )
    dma.start()
    dma.wait()

    mw = mw_ref[...]
    for t in range(tr):
        lo = llo_ref[band, t]
        hi = lhi_ref[band, t]
        f = frac_ref[band, t]
        row_lo = slab_ref[pl.ds(lo, 1)][0].astype(jnp.float32)
        row_hi = slab_ref[pl.ds(hi, 1)][0].astype(jnp.float32)
        xr = row_lo * (1.0 - f) + row_hi * f  # (Wi, C) f32
        yr = jax.lax.dot_general(
            mw, xr.astype(mw.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Wo, C)
        y_ref[0, t] = yr.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "interpret"))
def resize_bilinear_pallas(
    x: jax.Array, out_h: int, out_w: int, *, interpret: bool = False
):
    """align_corners=True bilinear upsample of NHWC ``x`` (see module doc)."""
    b, hi, wi, c = x.shape
    plan = _plan(hi, wi, c, out_h, out_w)
    assert plan is not None, "caller must check resize_eligible first"
    tr, trs = plan
    n_bands = out_h // tr
    wi8 = -(-wi // 8) * 8
    if wi8 != wi:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wi8 - wi), (0, 0)))

    lo, hi_i, frac = _interp_taps(hi, out_h, True)
    start = np.zeros((n_bands,), np.int32)
    llo = np.zeros((n_bands, tr), np.int32)
    lhi = np.zeros((n_bands, tr), np.int32)
    fr = np.zeros((n_bands, tr), np.float32)
    for bnd in range(n_bands):
        s = min(int(lo[bnd * tr]), hi - trs)
        start[bnd] = s
        for t in range(tr):
            llo[bnd, t] = int(lo[bnd * tr + t]) - s
            lhi[bnd, t] = int(hi_i[bnd * tr + t]) - s
            fr[bnd, t] = float(frac[bnd * tr + t])

    mw_np = _interp_matrix(wi, out_w, True)
    if wi8 != wi:
        mw_np = np.pad(mw_np, ((0, 0), (0, wi8 - wi)))
    mw = jnp.asarray(mw_np, x.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x: manual slab DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mw, whole matrix
        ],
        out_specs=pl.BlockSpec(
            (1, tr, out_w, c), lambda *args: (args[0], args[1], 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((trs, wi8, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(_kernel, tr=tr, trs=trs, wo=out_w, c=c)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w, c), x.dtype),
        interpret=interpret,
    )(
        jnp.asarray(start), jnp.asarray(llo), jnp.asarray(lhi),
        jnp.asarray(fr), x, mw,
    )
