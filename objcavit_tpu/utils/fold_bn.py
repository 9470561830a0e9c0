"""Fold inference-time BatchNorm affines into the preceding conv weights.

At eval, ``BN(conv(x)) = conv(x) * s + t`` with per-channel
``s = gamma / sqrt(var + eps)`` and ``t = beta - mean * s`` — an affine that
rewrites into the conv kernel and bias exactly. XLA fuses the affine into the
conv epilogue but still executes it against runtime param operands; removing
the op entirely is worth ~14% on the flagship GraphBins-B5 forward (measured
on a v5e chip: 42.0ms -> 36.7ms per batch of 8, scripts/ab_perf.py).

``fold_batchnorm(variables)`` maps the variables of a model built with
``fold_bn=False`` onto the params of the same model built with
``fold_bn=True``. Folding is done in fp32 (params are stored fp32; model
dtype is applied at apply-time), so results match the unfolded model to
normal bf16/fp32 rounding.

Conv/BN sibling pairs in this codebase (see models/common.py, models/decoder.py):
  conv / bn          (ConvBnAct — encoder stem, expand, project; eps 1e-3)
  dw_conv / dw_bn    (MBConv, DepthwiseSeparable depthwise; eps 1e-3)
  conv0 / bn0, conv1 / bn1  (UpSampleWithSkip; eps 1e-5, convs biased)

The reference keeps BN unfolded everywhere (torch eval still runs
F.batch_norm, modules/DenseFeatureExtractor.py:41-47); folding is a
TPU-serving optimisation with identical math.
"""

from __future__ import annotations

import jax.numpy as jnp

# bn sibling name -> (conv sibling name, bn epsilon as constructed)
_BN_TO_CONV = {
    "bn": ("conv", 1e-3),
    "dw_bn": ("dw_conv", 1e-3),
    "bn0": ("conv0", 1e-5),
    "bn1": ("conv1", 1e-5),
}


def _bn_leaves(bn_params, bn_stats):
    """Handle both the BatchNorm wrapper ({'bn': {...}}) and a bare nn.BatchNorm."""
    if "bn" in bn_params and "scale" not in bn_params:
        bn_params, bn_stats = bn_params["bn"], bn_stats["bn"]
    return bn_params["scale"], bn_params["bias"], bn_stats["mean"], bn_stats["var"]


def _fold_conv(conv, bn_params, bn_stats, eps: float) -> dict:
    gamma, beta, mean, var = (
        jnp.asarray(t, jnp.float32) for t in _bn_leaves(bn_params, bn_stats)
    )
    s = gamma / jnp.sqrt(var + eps)
    kernel = jnp.asarray(conv["kernel"], jnp.float32) * s  # HWIO: broadcast on O
    bias = beta - mean * s
    if "bias" in conv:
        bias = bias + jnp.asarray(conv["bias"], jnp.float32) * s
    out = dict(conv)
    out["kernel"] = kernel.astype(conv["kernel"].dtype)
    out["bias"] = bias.astype(conv["kernel"].dtype)
    return out


def _is_subtree(v) -> bool:
    return hasattr(v, "keys")  # dict or FrozenDict


def _merge_repconv(params, stats) -> dict:
    """RepVGG deploy fusion: fold each branch's BN, pad the 1x1 kernel to
    3x3 (centre), add the (optional) identity branch as a centred identity
    kernel, sum everything into ONE biased 3x3 conv ('merged_conv')."""
    dense = _fold_conv(params["rbr_dense_conv"], params["rbr_dense_bn"],
                       stats["rbr_dense_bn"], 1e-3)
    one = _fold_conv(params["rbr_1x1_conv"], params["rbr_1x1_bn"],
                     stats["rbr_1x1_bn"], 1e-3)
    k = jnp.asarray(dense["kernel"], jnp.float32)  # (3, 3, I, O)
    k = k + jnp.pad(jnp.asarray(one["kernel"], jnp.float32),
                    ((1, 1), (1, 1), (0, 0), (0, 0)))
    b = jnp.asarray(dense["bias"], jnp.float32) + jnp.asarray(
        one["bias"], jnp.float32
    )
    if "rbr_identity_bn" in params:  # only when in_ch == out_ch
        gamma, beta, mean, var = _bn_leaves(
            params["rbr_identity_bn"], stats["rbr_identity_bn"]
        )
        s = jnp.asarray(gamma, jnp.float32) / jnp.sqrt(
            jnp.asarray(var, jnp.float32) + 1e-3
        )
        c = k.shape[2]
        ident = jnp.zeros_like(k).at[1, 1, jnp.arange(c), jnp.arange(c)].set(s)
        k = k + ident
        b = b + jnp.asarray(beta, jnp.float32) - jnp.asarray(mean, jnp.float32) * s
    dt = params["rbr_dense_conv"]["kernel"].dtype
    return {"merged_conv": {"kernel": k.astype(dt), "bias": b.astype(dt)}}


def _fold_tree(params, stats) -> dict:
    if "rbr_dense_conv" in params:  # a RepConv subtree
        return _merge_repconv(params, stats)
    out = {}
    consumed = set()
    for bn_name, (conv_name, eps) in _BN_TO_CONV.items():
        if bn_name in params and conv_name in params and bn_name in stats:
            out[conv_name] = _fold_conv(
                params[conv_name], params[bn_name], stats[bn_name], eps
            )
            consumed.add(bn_name)
            consumed.add(conv_name)
    for k, v in params.items():
        if k in consumed:
            continue
        if _is_subtree(v):
            sub_stats = stats.get(k, {}) if _is_subtree(stats) else {}
            out[k] = _fold_tree(v, sub_stats)
        else:
            out[k] = v
    return out


def fold_batchnorm(variables) -> dict:
    """{'params': ..., 'batch_stats': ...} -> {'params': ...} for fold_bn=True.

    Unpaired BatchNorms (none exist in the depth models today) would keep
    their params, which the folded model then fails to consume — flax's
    strict apply surfaces that as an error rather than silently wrong math.
    """
    return {
        "params": _fold_tree(variables["params"], variables.get("batch_stats", {}))
    }
