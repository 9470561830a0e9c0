"""Shared benchmark harness: timing methodology + flagship-model builder.

One definition of the measurement rules (bench.py, scripts/bench_sweep.py,
scripts/ab_attention.py all import from here) so methodology fixes apply
everywhere at once:

  * jax.block_until_ready does not fully synchronise through the axon TPU
    tunnel — completion is forced with a host readback (``sync``).
  * best-of-N trials rejects transient tunnel stalls (observed: a one-off
    20x slowdown that vanished on re-run).
"""

from __future__ import annotations

import time

import numpy as np


def best_of(fn, sync, trials: int = 3, n_iter: int = 30) -> float:
    """Seconds per call: best mean over `trials` runs of `n_iter` calls."""
    fn()  # warm / compile
    sync()
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def p50_of(fn, sync, n_iter: int = 21) -> float:
    """Median seconds per synchronised call (single-dispatch latency). Each
    iteration pays the host-readback sync, so this is the latency a caller
    actually observes per batch, unlike best_of's pipelined throughput."""
    fn()
    sync()
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def flops_of_compiled(compiled) -> float:
    """XLA-reported FLOPs of an AOT-compiled program (0.0 if unavailable)."""
    try:
        an = compiled.cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


V5E_BF16_PEAK_TFLOPS = 197.0  # v5e per-chip bf16 peak (2 MXUs)


def flagship_kwargs(attn_impl: str = "xla"):
    import jax.numpy as jnp

    return dict(
        encoder_name="efficientnet-b5", n_bins=256, min_depth=0.001,
        max_depth=10.0, pos_strategy="learned_bbox_wh",
        dims_train=(416, 544), dims_test=(480, 640), dtype=jnp.bfloat16,
        attn_impl=attn_impl,
    )


def build_flagship(
    batch: int,
    h: int = 480,
    w: int = 640,
    n_obj: int = 32,
    attn_impl: str = "xla",
    fold: bool = True,
    seed: int = 0,
):
    """Flagship GraphBins-B5 eval forward (bf16, BN folded by default).

    Returns (fwd, (params, img, feats, xywh, valid)) with fwd jitted; the
    model output is the full dict ({'depth_pred', 'bin_edges'}).
    """
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models import GraphBins
    from objcavit_tpu.utils.fold_bn import fold_batchnorm

    kw = {**flagship_kwargs(attn_impl), "dims_test": (h, w)}
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((batch, n_obj, 512)).astype(np.float32))
    xywh = jnp.asarray(rng.uniform(0, 600, (batch, n_obj, 4)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(batch, n_obj)) < 0.5)

    init_model = GraphBins(**{**kw, "attn_impl": "xla"})
    variables = jax.jit(init_model.init)(
        jax.random.PRNGKey(seed), img[:1], feats[:1], xywh[:1], valid[:1]
    )
    if fold:
        params = fold_batchnorm(variables)
        model = GraphBins(**kw, fold_bn=True)
    else:
        params = variables
        model = GraphBins(**kw)
    fwd = jax.jit(lambda p, *a: model.apply(p, *a))
    return fwd, (params, img, feats, xywh, valid)
