"""Multi-head attention core: XLA path now, Pallas fused kernel pluggable.

All the reference's attention problems are tiny by TPU standards (seq <= 1200,
embed 128, 4 heads -> head_dim 32), so a whole (B, h, S, S) score tile fits in
VMEM. The XLA path below already fuses well; ``impl='pallas'`` routes to the
fused kernel in ops/pallas_attention.py on TPU backends.

Masking convention follows torch ``key_padding_mask``: boolean, True = masked
(ignored) key. Softmax runs in fp32 regardless of input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def mha_core(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_padding_mask: jax.Array | None = None,
    impl: str = "xla",
) -> jax.Array:
    """Scaled-dot-product attention.

    Args:
      q: (B, Sq, H, D); k, v: (B, Sk, H, D).
      key_padding_mask: (B, Sk) bool, True = masked key (torch convention).
      impl: 'xla' | 'pallas'.

    Returns (B, Sq, H, D).
    """
    if impl == "pallas":
        from objcavit_tpu.ops.pallas_attention import pallas_mha

        return pallas_mha(q, k, v, key_padding_mask)

    d = q.shape[-1]
    # accumulate scores in at least fp32 (fp64 stays fp64 — the float64
    # backward-parity oracle depends on it)
    acc_t = jnp.promote_types(q.dtype, jnp.float32)
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, acc_t))
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=acc_t
    ) * scale
    if key_padding_mask is not None:
        scores = jnp.where(
            key_padding_mask[:, None, None, :], _NEG_INF, scores
        )
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)
    return out
