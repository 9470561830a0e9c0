"""Device-side batched augmentation (the reference's GPU kornia step).

Replicates modules/DataAugmentation.py + the ImageNet normalisation applied in
on_after_batch_transfer (GraphBinsLM.py:431-452), as a pure jit-compatible
function keyed by a JAX PRNG — it runs *inside* the train step, fused into the
same XLA program as the forward pass (no separate kernel launches, no
host<->device hops):

  * horizontal flip p=0.5 (image+depth share the coin)
  * per-image random gamma in [0.9, 1.1)
  * planckian jitter p=0.5 (arXiv:2202.07993). kornia's 'blackbody' mode picks
    from 25 tabulated illuminants; we sample the Planckian locus continuously
    (T ~ U[3000K, 15000K], channel gains r/g and b/g) — same distribution
    family, no lookup table dependency.

Layout NHWC; expects [0,1] images, returns ImageNet-normalised images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from objcavit_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD


def _planckian_gains(key: jax.Array, n: int):
    """Channel gains (r/g, 1, b/g) for blackbody temperatures U[3000, 15000]K.

    Uses the standard Planckian-locus polynomial approximation for CIE xy,
    then converts to linear sRGB and normalises green to 1.
    """
    t = jax.random.uniform(key, (n,), minval=3000.0, maxval=15000.0)
    invt = 1e3 / t
    invt2 = invt * invt
    invt3 = invt2 * invt
    x = jnp.where(
        t < 4000.0,
        -0.2661239 * invt3 - 0.2343589 * invt2 + 0.8776956 * invt + 0.179910,
        -3.0258469 * invt3 + 2.1070379 * invt2 + 0.2226347 * invt + 0.240390,
    )
    x2, x3 = x * x, x * x * x
    y = jnp.where(
        t < 2222.0,
        -1.1063814 * x3 - 1.34811020 * x2 + 2.18555832 * x - 0.20219683,
        jnp.where(
            t < 4000.0,
            -0.9549476 * x3 - 1.37418593 * x2 + 2.09137015 * x - 0.16748867,
            3.0817580 * x3 - 5.87338670 * x2 + 3.75112997 * x - 0.37001483,
        ),
    )
    # xyY (Y=1) -> XYZ -> linear sRGB
    X = x / y
    Z = (1.0 - x - y) / y
    r = 3.2404542 * X - 1.5371385 + (-0.4985314) * Z
    g = -0.9692660 * X + 1.8760108 + 0.0415560 * Z
    b = 0.0556434 * X - 0.2040259 + 1.0572252 * Z
    r = jnp.maximum(r, 1e-6)
    g = jnp.maximum(g, 1e-6)
    b = jnp.maximum(b, 1e-6)
    return r / g, b / g


def augment_batch(
    rng: jax.Array, image: jax.Array, depth: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """image (B,H,W,3) in [0,1], depth (B,H,W,1). Returns normalised image."""
    b = image.shape[0]
    k_flip, k_gamma, k_pl_on, k_pl_t = jax.random.split(rng, 4)

    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    image = jnp.where(flip[:, None, None, None], image[:, :, ::-1, :], image)
    depth = jnp.where(flip[:, None, None, None], depth[:, :, ::-1, :], depth)

    # per-image gamma in [0.9, 1.1) (DataAugmentation.py:62-64)
    gamma = 1.0 + (jax.random.uniform(k_gamma, (b, 1, 1, 1)) - 0.5) * 0.2
    image = jnp.power(jnp.maximum(image, 0.0), gamma)

    # planckian jitter p=0.5
    apply_pl = jax.random.bernoulli(k_pl_on, 0.5, (b,))
    gain_r, gain_b = _planckian_gains(k_pl_t, b)
    gain = jnp.stack([gain_r, jnp.ones_like(gain_r), gain_b], axis=-1)
    gain = jnp.where(apply_pl[:, None], gain, 1.0)
    image = jnp.clip(image * gain[:, None, None, :], 0.0, 1.0)

    mean = jnp.asarray(IMAGENET_MEAN, image.dtype)
    std = jnp.asarray(IMAGENET_STD, image.dtype)
    image = (image - mean) / std
    return image, depth
