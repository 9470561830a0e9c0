"""Fused multi-head attention as a single Pallas TPU kernel.

The attention problems in this framework are small (S <= 1200, head_dim 32,
4 heads — miniViT/ObjCAViT, reference layers.py:8-9, ObjCAViT.py:155-164), so
one (batch, head) slice fits entirely in VMEM: the kernel loads Q/K/V once,
computes the full (Sq, Sk) score tile on the MXU, does an fp32 softmax on the
VPU, and multiplies by V — one HBM round-trip instead of XLA's
score-materialising pipeline of separate ops.

Key-padding masks arrive as an additive fp32 bias row (0 = attend,
-1e30 = masked) so the kernel stays branch-free.

The op carries a custom VJP that recomputes attention weights in the backward
kernel (flash-style rematerialisation) — cheaper than saving the (Sq, Sk)
weights to HBM at these sizes, and it makes the op usable in training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VAL = -1e30


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)  # (Sq, D)
    k = k_ref[0].astype(jnp.float32)  # (Sk, D)
    v = v_ref[0].astype(jnp.float32)  # (Sk, D)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    scores = scores + bias_ref[0]  # (1, Sk) broadcasts over Sq
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(w, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, scale):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    scores = scores + bias_ref[0]  # (1, Sk) broadcasts over Sq
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)  # (Sq, Sk)

    dv_ref[0] = jax.lax.dot_general(
        w, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dw = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))  # softmax VJP
    dq_ref[0] = (
        jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    ).astype(dq_ref.dtype)
    dk_ref[0] = (
        jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    ).astype(dk_ref.dtype)


def _spec(s, d):
    return pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _bias_spec(s):
    # bias is carried as (B*H, 1, S) so the (1, 1, S) block satisfies the
    # TPU tiling rule (last two dims equal to the array's)
    return pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _attn(q, k, v, bias):
    return _attn_fwd_impl(q, k, v, bias)


def _attn_fwd_impl(q, k, v, bias):
    bh, sq, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / (d**0.5)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        grid=(bh,),
        in_specs=[_spec(sq, d), _spec(sk, d), _spec(sk, d), _bias_spec(sk)],
        out_specs=_spec(sq, d),
    )(q, k, v, bias)


def _attn_fwd(q, k, v, bias):
    return _attn_fwd_impl(q, k, v, bias), (q, k, v, bias)


def _attn_bwd(res, g):
    q, k, v, bias = res
    bh, sq, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / (d**0.5)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(bh,),
        in_specs=[
            _spec(sq, d), _spec(sk, d), _spec(sk, d), _bias_spec(sk),
            _spec(sq, d),
        ],
        out_specs=(_spec(sq, d), _spec(sk, d), _spec(sk, d)),
    )(q, k, v, bias, g)
    return dq, dk, dv, None  # no grad into the mask bias


_attn.defvjp(_attn_fwd, _attn_bwd)


def pallas_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_padding_mask: jax.Array | None = None,
) -> jax.Array:
    """Drop-in for ops.attention.mha_core(..., impl='xla').

    q: (B, Sq, H, D); k, v: (B, Sk, H, D); mask (B, Sk) bool True=masked.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]

    def bh(x):  # (B, S, H, D) -> (B*H, S, D)
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    if key_padding_mask is None:
        bias = jnp.zeros((b, sk), jnp.float32)
    else:
        bias = jnp.where(key_padding_mask, _MASK_VAL, 0.0).astype(jnp.float32)
    bias = jnp.repeat(bias, h, axis=0)[:, None, :]  # (B*H, 1, Sk)

    out = _attn(bh(q), bh(k), bh(v), bias)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
