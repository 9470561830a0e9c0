"""Depth losses, pure JAX, fixed-shape (mask-based) versions of the reference.

Parity notes (all citations into /root/reference):
  * SILog: paper-form Dg = mean(g^2) - (lam/T^2) * sum(g)^2, alpha=10, lam=0.85
    (losses/SILogLoss.py:24-25,53-56); pred bilinearly upsampled to GT
    resolution with align_corners=True before masking (:46-47).
  * Bins chamfer: pytorch3d chamfer_distance between bin centres and valid GT
    depths (losses/BinsChamferLoss.py:21-37) — see ops/chamfer.py.
  * MSE: unmasked mean-squared error (losses/MSELoss.py:6-14).
  * Wrapper: weighted sum keyed by args.loss.names / args.loss.coeffs
    (losses/LossWrapper.py:40-66).

The reference masks by boolean indexing (ragged); we use masked reductions
with identical arithmetic. Layout NHWC.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from objcavit_tpu.ops.chamfer import masked_chamfer_1d
from objcavit_tpu.ops.resize import resize_bilinear

_POSSIBLE_LOSSES = ("mse", "silog", "bins_chamfer")


def silog_loss(
    depth_pred: jax.Array,
    depth_gt: jax.Array,
    depth_mask: jax.Array | None = None,
    interpolate: bool = True,
    alpha: float = 10.0,
    lam: float = 0.85,
) -> jax.Array:
    """Scale-invariant log loss (AdaBins paper section 3.4 form)."""
    if interpolate:
        depth_pred = resize_bilinear(
            depth_pred, depth_gt.shape[1], depth_gt.shape[2], align_corners=True
        )
    g = jnp.log(depth_pred) - jnp.log(depth_gt)
    if depth_mask is None:
        n = jnp.asarray(g.size, dtype=g.dtype)
        sum_g = jnp.sum(g)
        sum_g2 = jnp.sum(g * g)
    else:
        m = depth_mask.astype(g.dtype)
        n = jnp.sum(m)
        g = jnp.where(depth_mask, g, 0.0)
        sum_g = jnp.sum(g)
        sum_g2 = jnp.sum(g * g)
    dg = sum_g2 / n - (lam / (n * n)) * (sum_g * sum_g)
    return alpha * jnp.sqrt(dg)


def bins_chamfer_loss(
    depth_gt: jax.Array, depth_mask: jax.Array, bin_edges: jax.Array
) -> jax.Array:
    """Chamfer distance between per-image bin centres and valid GT depths."""
    centers = 0.5 * (bin_edges[:, 1:] + bin_edges[:, :-1])  # (N, K)
    n = depth_gt.shape[0]
    target = depth_gt.reshape(n, -1)
    mask = depth_mask.reshape(n, -1)
    return masked_chamfer_1d(centers, target, mask)


def mse_loss(depth_pred: jax.Array, depth_gt: jax.Array) -> jax.Array:
    return jnp.mean((depth_pred - depth_gt) ** 2)


class LossWrapper:
    """Config-driven weighted sum of loss components (LossWrapper.py parity)."""

    def __init__(self, names: Sequence[str], coeffs: Sequence[float]):
        assert len(names) >= 1, "Error: no loss names given"
        assert all(n in _POSSIBLE_LOSSES for n in names), "unrecognised loss"
        assert len(coeffs) == len(names), "mismatched loss components/coeffs"
        self.names = tuple(names)
        self.coeffs = tuple(float(c) for c in coeffs)

    @classmethod
    def from_args(cls, args: Any) -> "LossWrapper":
        return cls(list(args.loss.names), list(args.loss.coeffs))

    def __call__(
        self,
        depth_pred: jax.Array,
        depth_gt: jax.Array,
        depth_mask: jax.Array,
        bin_edges: jax.Array | None = None,
    ) -> jax.Array:
        total = jnp.asarray(0.0, dtype=jnp.float32)
        for name, coeff in zip(self.names, self.coeffs):
            if name == "silog":
                comp = silog_loss(depth_pred, depth_gt, depth_mask)
            elif name == "bins_chamfer":
                comp = bins_chamfer_loss(depth_gt, depth_mask, bin_edges)
            elif name == "mse":
                comp = mse_loss(depth_pred, depth_gt)
            else:  # pragma: no cover - guarded in __init__
                raise ValueError(name)
            total = total + coeff * comp
        return total
