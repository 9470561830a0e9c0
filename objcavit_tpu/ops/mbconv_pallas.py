"""Fused Pallas MBConv head: expand 1x1 -> SiLU -> depthwise -> SiLU -> SE pool.

WHY. The EfficientNet-B5 encoder's mid stages run at 2.5-14% MFU on v5e not
because XLA schedules them badly but because the unfused MBConv body is
structurally 5 HBM passes of the EXPANDED (6x-width) tensor per block:
expand-out write, dw read, dw write, SE-pool read, gated-project read
(docs/PERF.md, scripts/profile_encoder_stages.py: stages 1/2/4 = 72 of the
118 ms bs=96 encoder forward, all at the materialisation roofline). This
kernel computes expand + depthwise + SiLU + the SE global pool sum in ONE
VMEM-resident pass, cutting the big passes to 2 (dw-out write, project
read); the 1x1 project + SE gate stay in XLA, which fuses the gate multiply
into the conv read.

HOW (TPU specifics, /opt/skills/guides/pallas_guide.md):
  * grid (B, M/MB, H/TH): per step, DMA a haloed row-band of the SMALL
    input (pre-padded in HBM so every slice is static-size), expand it with
    one MXU matmul, run the depthwise taps on the VMEM tile, write one
    output band + accumulate the pool sum (out block revisited across the
    fastest grid dim).
  * the depthwise avoids the per-tap sublane relayouts that sank the
    earlier dw-only kernel (ops/dw_pallas.py, 0.36-0.45x XLA): the kw
    W-shifted copies of the expanded band are materialised ONCE each into
    scratch (kw relayout passes instead of kh*kw), after which every tap is
    a free row-offset read.
  * boundary zeroing is a vectorised mask on the expanded band (the HBM
    pre-pad is zeros, but expand-of-zero is silu(bias) != 0, so the halo
    ring outside the image must be re-zeroed before the dw taps).

Inference-only (the train path keeps the differentiable XLA composition);
exactness vs the unfused ops is pinned by tests/test_mbconv_pallas.py in
interpret mode and the on-chip win by scripts/ab_mbconv_pallas.py.
Reference counterpart: the timm MBConv bodies wrapped at
/root/reference/modules/DenseFeatureExtractor.py:11-27 (structure only —
this fusion has no torch equivalent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024

# Tests flip this to run the wired module path in interpreter mode on CPU.
INTERPRET = False


def _tile_plan(h: int, w: int, cin: int, m: int, k: int):
    """Pick (TH, MB): TH divides h, MB divides m, VMEM use under budget.
    Returns None if no plan fits (caller falls back to XLA)."""
    p = k // 2

    wp = -(-(w + 2 * p) // 8) * 8  # band width 8-aligned for the DMA slice
    cin_p = -(-cin // 128) * 128   # lane dim 128-aligned for the DMA slice

    def vmem_bytes(th, mb):
        xs = (th + 2 * p) * wp * cin_p * 2                  # input band
        e = (th + 2 * p) * wp * mb * 2                      # expanded band
        s = k * (th + 2 * p) * w * mb * 2                   # shifted copies
        acc = th * w * mb * 4                               # f32 accumulator
        yblk = 2 * th * w * mb * 2                          # dbl-buffered out
        return xs + e + s + acc + yblk

    # th >= 4p bounds the halo-recompute overhead of the expand matmul at
    # 2p/(th+2p) <= 33%; below that the fusion loses to XLA on FLOPs alone
    ths = [
        d for d in (30, 24, 20, 16, 15, 12, 10, 8, 6, 5, 4)
        if h % d == 0 and d >= 4 * p
    ]
    # lane-dim blocks must be 128-multiples (or the full array dim)
    mbs = [
        m // d for d in (1, 2, 3, 4, 6, 8)
        if m % d == 0 and (d == 1 or (m // d) % 128 == 0)
    ]
    for mb in mbs:  # prefer widest M tile (fewest input re-reads)
        for th in ths:  # prefer tallest band (fewest halo recomputes)
            if vmem_bytes(th, mb) <= _VMEM_BUDGET:
                return th, mb
    return None


def _kernel(xs_hbm, we_ref, be_ref, wd_ref, bd_ref, y_ref, pool_ref,
            xs_ref, e_ref, s_ref, dma_sem, *, k, th, hh, ww, wp):
    p = k // 2
    ht = pl.program_id(2)

    # haloed input band: static size thanks to the HBM pre-pad (width padded
    # to a multiple of 8 — Mosaic requires DMA slices sublane-aligned)
    bi = pl.program_id(0)
    dma = pltpu.make_async_copy(
        xs_hbm.at[bi, pl.ds(ht * th, th + 2 * p)], xs_ref, dma_sem
    )
    dma.start()
    dma.wait()

    # expand: one MXU matmul over the whole band, f32 accum, SiLU, ->bf16
    band = xs_ref[...]
    rows = (th + 2 * p) * wp
    ex = jnp.dot(
        band.reshape(rows, band.shape[-1]), we_ref[...],
        preferred_element_type=jnp.float32,
    ) + be_ref[0].astype(jnp.float32)
    ex = ex * jax.nn.sigmoid(ex)
    ex = ex.reshape(th + 2 * p, wp, -1)

    # zero the ring outside the image (pre-pad zeros expanded to silu(bias)).
    # 3-D iota: Mosaic can't minor-dim-reshape an i1 vector (bool [:, :, None])
    shp3 = (th + 2 * p, wp, 1)
    row_g = jax.lax.broadcasted_iota(jnp.int32, shp3, 0) + ht * th
    col_g = jax.lax.broadcasted_iota(jnp.int32, shp3, 1)
    inside = (
        (row_g >= p) & (row_g < hh + p) & (col_g >= p) & (col_g < ww + p)
    )
    e_ref[...] = jnp.where(inside, ex, 0.0).astype(e_ref.dtype)

    # kw W-shifted copies: the ONLY sublane relayouts in the kernel
    for j in range(k):
        s_ref[j] = e_ref[:, j : j + ww, :]

    # depthwise taps: free row-offset reads of the shifted copies
    acc = jnp.zeros((th, ww, e_ref.shape[-1]), jnp.float32)
    for i in range(k):
        for j in range(k):
            acc = acc + (
                s_ref[j, i : i + th, :, :].astype(jnp.float32)
                * wd_ref[i, j, :].astype(jnp.float32)
            )
    acc = acc + bd_ref[0].astype(jnp.float32)
    y = acc * jax.nn.sigmoid(acc)
    y_ref[0] = y.astype(y_ref.dtype)

    @pl.when(ht == 0)
    def _():
        pool_ref[...] = jnp.zeros_like(pool_ref)

    pool_ref[0, 0, :] += jnp.sum(y, axis=(0, 1))


def mbconv_eligible(h: int, w: int, cin: int, m: int, k: int,
                    stride: int) -> bool:
    return (
        stride == 1
        and k in (3, 5)
        and _tile_plan(h, w, cin, m, k) is not None
    )


@functools.partial(jax.jit, static_argnames=("ksize", "interpret"))
def mbconv_expand_dw_pool(
    x: jax.Array,   # (B, H, W, Cin)
    we: jax.Array,  # (Cin, M) expand 1x1 kernel
    be: jax.Array,  # (M,) folded-BN expand bias
    wd: jax.Array,  # (k, k, 1, M) HWIO depthwise kernel
    bd: jax.Array,  # (M,) folded-BN dw bias
    *,
    ksize: int,
    interpret: bool = False,
):
    """silu(dw(silu(x @ we + be)) + bd) and its per-channel spatial sum.

    Returns (y (B,H,W,M) in x.dtype, pool (B,M) f32). SAME pad, stride 1.
    """
    b, h, w, cin = x.shape
    m = we.shape[-1]
    k = ksize
    p = k // 2
    plan = _tile_plan(h, w, cin, m, k)
    assert plan is not None, "caller must check mbconv_eligible first"
    th, mb = plan
    wp = -(-(w + 2 * p) // 8) * 8
    cin_p = -(-cin // 128) * 128

    xs = jnp.pad(x, ((0, 0), (p, p), (p, wp - w - p), (0, cin_p - cin)))
    wer = jnp.pad(we.astype(x.dtype), ((0, cin_p - cin), (0, 0)))
    ber = be.reshape(1, m)
    wdr = wd.reshape(k, k, m).astype(x.dtype)
    bdr = bd.reshape(1, m)

    grid = (b, m // mb, h // th)
    kernel = functools.partial(_kernel, k=k, th=th, hh=h, ww=w, wp=wp)
    y, pool = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # haloed input: manual DMA
            pl.BlockSpec((cin_p, mb), lambda bi, mi, hi: (0, mi)),
            pl.BlockSpec((1, mb), lambda bi, mi, hi: (0, mi)),
            pl.BlockSpec((k, k, mb), lambda bi, mi, hi: (0, 0, mi)),
            pl.BlockSpec((1, mb), lambda bi, mi, hi: (0, mi)),
        ],
        out_specs=[
            pl.BlockSpec((1, th, w, mb), lambda bi, mi, hi: (bi, hi, 0, mi)),
            pl.BlockSpec((1, 1, mb), lambda bi, mi, hi: (bi, 0, mi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, m), x.dtype),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((th + 2 * p, wp, cin_p), x.dtype),
            pltpu.VMEM((th + 2 * p, wp, mb), x.dtype),
            pltpu.VMEM((k, th + 2 * p, w, mb), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xs, wer, ber, wdr, bdr)
    return y, pool[:, 0, :]
