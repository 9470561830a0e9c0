"""Batch-in-sublanes fused MBConv head: expand 1x1 -> SiLU -> dw -> SiLU -> SE pool.

WHY. docs/PERF.md pins the EfficientNet-B5 encoder's MBConv stages at the
HBM roofline of their 5-7 materialisations of the 6x-expanded tensor, and
records that the first fused-head attempt (ops/mbconv_pallas.py, NHWC-style
blocks with W in sublanes) measured 0.53-0.73x XLA because every depthwise
tap forced sublane relayouts of the expanded band plus serial per-band DMA.
This kernel is the reformulation that analysis called for: operate in
(H, W, B, C) layout with the BATCH in sublanes and channels in lanes —
exactly the layout XLA's own depthwise emitter picks — so that every
depthwise tap is a static slice along the two LEADING axes of the expanded
band (a free address offset, no relayout whatsoever).

Per grid step:
  * manually DMA a (TH+2p, TW+2p, Bt, Cin) haloed input band (halo along
    leading dims only; the sublane dim Bt and lane dim Cin stay aligned),
  * expand it with ONE MXU matmul over (band rows, Cin) @ (Cin, mb), add
    the folded-BN bias, SiLU, re-zero the ring outside the image (the HBM
    zero-pad expands to silu(be) != 0),
  * run the k*k depthwise taps as leading-axis slices, accumulating each
    output row in f32 (one row live at a time keeps VMEM bounded), + bias,
    SiLU,
  * write the (TH, TW, Bt, mb) output band and fold its f32 spatial sum
    into the SE pool accumulator (revisited across the h/w grid dims).

The expanded tensor's HBM traffic drops from 5-7 passes to 2 (this kernel's
write + XLA's gated-project read); the SE gate multiply and 1x1 project
stay in XLA operating directly on the (H, W, B, M) layout (a 1x1 conv is a
lane-dim matmul, layout-indifferent), so only the SMALL Cin/Cout tensors
ever pay a transpose.

VERDICT (measured, docs/PERF.md "batch-in-sublanes fused MBConv"): even
with zero relayouts this measures 0.74-1.03x XLA across the eligible B5
stages (bs=96, bf16) — XLA's unfused schedule overlaps the dw/SiLU VPU
work with its HBM streams, so cutting the expanded tensor's 5-7 passes to
2 does not cut time. Kept as a documented experiment with parity tests
(tests/test_mbconv_bs.py, interpret mode); NOTHING wires it into a model.
The A/B harness is scripts/ab_mbconv_bs.py. Reference counterpart: the
timm MBConv bodies wrapped at
/root/reference/modules/DenseFeatureExtractor.py:11-27 (structure only —
this fusion has no torch equivalent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024

# Tests flip this to run the wired module path in interpreter mode on CPU.
INTERPRET = False


def _lane_pad(c: int) -> int:
    return -(-c // 128) * 128


def _tile_plan(h: int, w: int, b: int, cin: int, m: int, k: int):
    """Pick (Bt, mb, TH, TW) fitting VMEM. None -> caller falls back to XLA."""
    p = k // 2
    if b % 8 != 0:
        return None
    bt = 16 if b % 16 == 0 else 8  # bf16 native sublane tile is 16
    cin_l = _lane_pad(cin)

    # lane-dim blocks must be 128-multiples (or the full array dim)
    mbs = [m] + [
        m // d
        for d in (2, 3, 4, 6, 8, 12, 16, 24)
        if m % d == 0 and (m // d) % 128 == 0
    ]

    def vmem_bytes(mb, th, tw):
        mb_l = _lane_pad(mb)
        xs = (th + 2 * p) * (tw + 2 * p) * bt * cin_l * 2   # input band
        e = (th + 2 * p) * (tw + 2 * p) * bt * mb_l * 2     # expanded band
        acc = (tw + 2 * p) * bt * mb_l * 4                  # 1-row f32 acc
        rowtmp = (tw + 2 * p) * bt * mb_l * 4               # 1-row f32 expand
        yblk = 2 * th * tw * bt * mb_l * 2                  # dbl-buffered out
        pool = bt * mb_l * 4
        wts = cin_l * mb_l * 2 + k * k * mb_l * 2
        return xs + e + acc + rowtmp + yblk + pool + wts

    ths = [d for d in (16, 12, 10, 8, 6, 5, 4, 3, 2, 1) if h % d == 0]
    tws = [w] + [w // d for d in (2, 4, 5, 8) if w % d == 0]
    for mb in mbs:  # prefer widest M tile (fewest input re-reads)
        for tw in tws:  # prefer full W (least w-halo recompute)
            for th in ths:  # prefer tall bands (least h-halo recompute)
                # bound halo recompute of the expand matmul at ~2x
                if (th + 2 * p) * (tw + 2 * p) > 2.2 * th * tw:
                    continue
                if vmem_bytes(mb, th, tw) <= _VMEM_BUDGET:
                    return bt, mb, th, tw
    return None


def _kernel(xs_hbm, we_ref, be_ref, wd_ref, bd_ref, y_ref, pool_ref,
            xs_ref, e_ref, dma_sem, *, k, th, tw, hh, ww):
    p = k // 2
    bi = pl.program_id(0)
    hi = pl.program_id(2)
    wi = pl.program_id(3)
    bt = xs_ref.shape[2]

    # haloed input band: offsets along the two LEADING dims are unconstrained;
    # the sublane (Bt, multiple of 8/16) and lane (Cin, full) dims stay whole
    dma = pltpu.make_async_copy(
        xs_hbm.at[
            pl.ds(hi * th, th + 2 * p),
            pl.ds(wi * tw, tw + 2 * p),
            pl.ds(bi * bt, bt),
        ],
        xs_ref,
        dma_sem,
    )
    dma.start()
    dma.wait()

    # expand one band row at a time: the f32 matmul product lives only for
    # (tw+2p, bt, mb) before the bf16 cast, instead of the whole band in f32
    shp = (tw + 2 * p, bt, 1)
    col_g = jax.lax.broadcasted_iota(jnp.int32, shp, 0) + wi * tw
    col_in = (col_g >= p) & (col_g < ww + p)
    rows = (tw + 2 * p) * bt
    for r in range(th + 2 * p):
        band = xs_ref[r]
        ex = jnp.dot(
            band.reshape(rows, band.shape[-1]),
            we_ref[...],
            preferred_element_type=jnp.float32,
        ) + be_ref[0].astype(jnp.float32)
        ex = ex * jax.nn.sigmoid(ex)
        ex = ex.reshape(tw + 2 * p, bt, -1)
        # zero outside the image (zero-pad expands to silu(be) != 0)
        rg = hi * th + r
        inside = col_in & (rg >= p) & (rg < hh + p)
        e_ref[r] = jnp.where(inside, ex, 0.0).astype(e_ref.dtype)

    # depthwise taps: static slices along the two leading axes — no relayout.
    # One output row at a time bounds the f32 accumulator at (TW, Bt, mb).
    psum = jnp.zeros((bt, e_ref.shape[-1]), jnp.float32)
    for r in range(th):
        acc = jnp.zeros((tw, bt, e_ref.shape[-1]), jnp.float32)
        for i in range(k):
            row = e_ref[r + i]
            for j in range(k):
                acc = acc + (
                    row[j : j + tw].astype(jnp.float32)
                    * wd_ref[i, j].astype(jnp.float32)
                )
        acc = acc + bd_ref[0].astype(jnp.float32)
        y = acc * jax.nn.sigmoid(acc)
        y_ref[r] = y.astype(y_ref.dtype)
        psum = psum + jnp.sum(y, axis=0)

    first = (hi == 0) & (wi == 0)

    @pl.when(first)
    def _():
        pool_ref[...] = jnp.zeros_like(pool_ref)

    pool_ref[...] += psum.astype(pool_ref.dtype)


def mbconv_bs_eligible(h: int, w: int, b: int, cin: int, m: int, k: int,
                       stride: int) -> bool:
    return (
        stride == 1
        and k in (3, 5)
        and _tile_plan(h, w, b, cin, m, k) is not None
    )


@functools.partial(jax.jit, static_argnames=("ksize", "interpret"))
def mbconv_bs_expand_dw_pool(
    x_t: jax.Array,  # (H, W, B, Cin) batch-in-sublanes layout
    we: jax.Array,   # (Cin, M) expand 1x1 kernel
    be: jax.Array,   # (M,) folded-BN expand bias
    wd: jax.Array,   # (k, k, 1, M) HWIO depthwise kernel
    bd: jax.Array,   # (M,) folded-BN dw bias
    *,
    ksize: int,
    interpret: bool = False,
):
    """silu(dw(silu(x @ we + be)) + bd) and its per-channel spatial sum.

    Input/output live in (H, W, B, C) layout. Returns
    (y (H, W, B, M) in x.dtype, pool (B, M) f32). SAME pad, stride 1.
    """
    h, w, b, cin = x_t.shape
    m = we.shape[-1]
    k = ksize
    p = k // 2
    plan = _tile_plan(h, w, b, cin, m, k)
    assert plan is not None, "caller must check mbconv_bs_eligible first"
    bt, mb, th, tw = plan

    # lane-pad Cin to the 128 tile: Mosaic requires DMA slices 128-aligned in
    # the lane dim, and HBM arrays are (8,128)-tile-padded regardless, so the
    # explicit pad costs no extra traffic (zero lanes x zero weight rows = 0)
    cin_l = _lane_pad(cin)
    xs = jnp.pad(x_t, ((p, p), (p, p), (0, 0), (0, cin_l - cin)))
    wer = jnp.pad(we.astype(x_t.dtype), ((0, cin_l - cin), (0, 0)))
    ber = be.reshape(1, m)
    wdr = wd.reshape(k, k, m).astype(x_t.dtype)
    bdr = bd.reshape(1, m)

    grid = (b // bt, m // mb, h // th, w // tw)
    kernel = functools.partial(_kernel, k=k, th=th, tw=tw, hh=h, ww=w)
    y, pool = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # haloed input: manual DMA
            pl.BlockSpec((cin_l, mb), lambda bi, mi, hi, wi: (0, mi)),
            pl.BlockSpec((1, mb), lambda bi, mi, hi, wi: (0, mi)),
            pl.BlockSpec((k, k, mb), lambda bi, mi, hi, wi: (0, 0, mi)),
            pl.BlockSpec((1, mb), lambda bi, mi, hi, wi: (0, mi)),
        ],
        out_specs=[
            pl.BlockSpec(
                (th, tw, bt, mb), lambda bi, mi, hi, wi: (hi, wi, bi, mi)
            ),
            pl.BlockSpec((bt, mb), lambda bi, mi, hi, wi: (bi, mi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w, b, m), x_t.dtype),
            jax.ShapeDtypeStruct((b, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((th + 2 * p, tw + 2 * p, bt, cin_l), x_t.dtype),
            pltpu.VMEM((th + 2 * p, tw + 2 * p, bt, mb), x_t.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xs, wer, ber, wdr, bdr)
    return y, pool
