"""Fused Pallas depthwise-conv kernel: dw conv + bias + SiLU + SE pool sum.

**Measured NEGATIVE result — not wired into any model path.** On a real v5e
chip (`scripts/ab_dw_pallas.py --mode micro`, bs=96 bf16) this kernel runs
0.36-0.45x the speed of XLA's own depthwise emitter at every eligible B5
shape (e.g. (30,40)x672 k5: lax 3.20 ms vs pallas 8.88 ms). The original
motivation — an xplane trace that attributed 67.6 ms of the encoder forward
to these dw convs — turned out to be a mislabeled join against a different
compile; re-attribution showed XLA already runs them within ~3x of the VPU
compute floor, so there was never 7-10x of headroom. The kernel's shifted-tap
formulation pays TPU sublane relayouts on every (i,j) tap, which XLA's
input-batch-in-sublanes emitter avoids. Kept (with parity tests,
tests/test_dw_pallas.py) as a documented experiment, like the Pallas
attention A/B (`scripts/ab_attention.py`).

Design (TPU-first, see /opt/skills/guides/pallas_guide.md):
  * grid (B, C/CB): each step owns one batch sample x one channel tile. The
    full (H, W) plane fits VMEM for every eligible layer (H*W <= 1200), so
    there is no halo DMA — Pallas's standard BlockSpec pipeline double-buffers
    HBM<->VMEM around the kernel.
  * the conv is kh*kw shifted fused-multiply-adds over a zero-padded VMEM
    scratch — pure VPU work at full (8,128) lane width, f32 accumulation.
  * bias + SiLU fuse in, and the kernel optionally emits the per-channel
    spatial sum of the activated output: the SE block's global-average-pool
    (reference modules/DenseFeatureExtractor.py wraps timm blocks whose SE
    pools would otherwise re-read the activation from HBM) costs nothing.

Inference-only (no VJP). `dw_eligible` describes the shapes the kernel
supports; nothing in the model calls it (see the negative result above).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Eligibility bound: full padded plane + f32 accumulator must fit VMEM
# comfortably alongside the double-buffered in/out blocks.
_MAX_PLANE = 1200  # H*W


def dw_eligible(h: int, w: int, kernel_size: int, stride: int) -> bool:
    """True when the fused Pallas dw kernel supports/benefits this layer."""
    return (
        stride == 1
        and kernel_size in (3, 5)
        and h * w <= _MAX_PLANE
        and jax.default_backend() == "tpu"
    )


def _pick_cb(c: int, h: int, w: int, ksize: int) -> int:
    """Largest channel tile (multiple of 128) keeping VMEM use ~<10MB."""
    ph = ksize - 1
    for cb in (1024, 512, 256, 128):
        in_out = 2 * 2 * (h * w * cb * 2)  # double-buffered bf16 in+out blocks
        scratch = (h + ph) * (w + ph) * cb * 2  # padded plane, input dtype
        acc = h * w * cb * 4  # f32 accumulator
        if in_out + scratch + acc <= 10 * 1024 * 1024:
            return min(cb, max(128, c))
    return 128


def _dw_kernel(x_ref, w_ref, b_ref, y_ref, pool_ref, xp_ref, *, ksize, with_pool):
    h, w = x_ref.shape[1], x_ref.shape[2]
    p = (ksize - 1) // 2
    xp_ref[...] = jnp.zeros_like(xp_ref)
    xp_ref[p : p + h, p : p + w, :] = x_ref[0]
    acc = jnp.zeros(x_ref.shape[1:], jnp.float32)
    for i in range(ksize):
        for j in range(ksize):
            tap = xp_ref[i : i + h, j : j + w, :].astype(jnp.float32)
            acc = acc + tap * w_ref[i, j, :].astype(jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    y = acc * jax.nn.sigmoid(acc)  # SiLU
    y_ref[0] = y.astype(y_ref.dtype)
    if with_pool:
        pool_ref[...] = jnp.sum(y, axis=(0, 1))[None, None, :]


@functools.partial(
    jax.jit, static_argnames=("ksize", "with_pool", "interpret")
)
def dw_conv_silu_pool(
    x: jax.Array,  # (B, H, W, C)
    w: jax.Array,  # (kh, kw, 1, C) HWIO depthwise kernel
    b: jax.Array,  # (C,) folded-BN bias
    *,
    ksize: int,
    with_pool: bool = True,
    interpret: bool = False,
):
    """silu(dw_conv(x) + b) and (optionally) its per-channel spatial sum.

    Returns (y, pool_sum) with y (B,H,W,C) in x.dtype and pool_sum (B,C) f32,
    or (y, None) when with_pool=False. SAME padding, stride 1.
    """
    bsz, h, wdt, c = x.shape
    kh = kw = ksize
    wr = w.reshape(kh, kw, c).astype(x.dtype)
    br = b.reshape(1, c)
    cb = _pick_cb(c, h, wdt, ksize)
    grid = (bsz, pl.cdiv(c, cb))
    p = ksize - 1

    out_shapes = [jax.ShapeDtypeStruct((bsz, h, wdt, c), x.dtype)]
    out_specs = [
        pl.BlockSpec((1, h, wdt, cb), lambda bi, ci: (bi, 0, 0, ci))
    ]
    if with_pool:
        # (B, 1, C): the singleton keeps the trailing block dims legal
        # (second-to-last must divide 8 or equal the array dim).
        out_shapes.append(jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, cb), lambda bi, ci: (bi, 0, ci)))

    kernel = functools.partial(_dw_kernel, ksize=ksize, with_pool=with_pool)
    if not with_pool:
        kernel = functools.partial(_no_pool_wrap, kernel)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, wdt, cb), lambda bi, ci: (bi, 0, 0, ci)),
            pl.BlockSpec((kh, kw, cb), lambda bi, ci: (0, 0, ci)),
            pl.BlockSpec((1, cb), lambda bi, ci: (0, ci)),
        ],
        out_specs=out_specs if with_pool else out_specs[0],
        out_shape=out_shapes if with_pool else out_shapes[0],
        scratch_shapes=[pltpu.VMEM((h + p, wdt + p, cb), x.dtype)],
        interpret=interpret,
    )(x, wr, br)
    if with_pool:
        return outs[0], outs[1][:, 0, :]
    return outs, None


def _no_pool_wrap(kernel, x_ref, w_ref, b_ref, y_ref, xp_ref):
    kernel(x_ref, w_ref, b_ref, y_ref, None, xp_ref)
