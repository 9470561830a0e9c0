"""Shared flax building blocks: torch-compatible inits, conv/BN, MBConv family.

Everything is NHWC. Parameter initialisers replicate torch defaults so that
training-from-scratch matches the reference's initial distributions:
  * torch Linear/Conv default: kaiming_uniform(a=sqrt(5)) for weights ->
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias U(-1/sqrt(fan_in), 1/sqrt(fan_in))
  * nn.MultiheadAttention in_proj: xavier_uniform
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform(a=sqrt(5)) for conv (HWIO) / linear (I, O) kernels.

    With a=sqrt(5): gain = sqrt(2/(1+5)) = 1/sqrt(3), so the uniform bound
    sqrt(3)*gain/sqrt(fan_in) collapses to 1/sqrt(fan_in).
    """
    if len(shape) == 2:  # linear (in, out)
        fan_in = shape[0]
    else:  # conv HWIO
        fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """nn.Linear with torch default initialisation."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init, (in_features, self.features)
        )
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", torch_bias_init_for(in_features), (self.features,)
            )
            y = y + bias.astype(self.dtype)
        return y


class TorchConv(nn.Module):
    """nn.Conv2d with torch default initialisation, NHWC, HWIO kernels.

    padding follows flax conventions; 'SAME' reproduces TF-style asymmetric
    same-padding, which is exactly what the tf_efficientnet_* encoders use.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        kernel_shape = (kh, kw, in_features // self.feature_group_count, self.features)
        kernel = self.param("kernel", torch_kernel_init, kernel_shape)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=tuple(self.strides),
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            fan_in = kh * kw * (in_features // self.feature_group_count)
            bias = self.param("bias", torch_bias_init_for(fan_in), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class PatchEmbedConv(nn.Module):
    """Non-overlapping (kernel == stride) patch-embed conv computed as
    crop + space-to-depth reshape + ONE matmul.

    Identical parameters (TorchConv layout: HWIO kernel + bias, same init)
    and identical forward math to TorchConv(features, (p, p), (p, p),
    'VALID') — the matmul form exists because XLA lowers the conv's
    data-gradient to an input-dilated convolution doing p^2 (=256 for the
    ViT heads) times the useful FLOPs: measured ~150 ms of a 242 ms flagship
    train step. The matmul's gradients are two clean MXU matmuls.
    """

    features: int
    patch_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        b, h, w, c = x.shape
        gh, gw = h // p, w // p
        kernel = self.param(
            "kernel", torch_kernel_init, (p, p, c, self.features)
        )
        bias = self.param(
            "bias", torch_bias_init_for(p * p * c), (self.features,)
        )
        x = x[:, : gh * p, : gw * p]  # VALID conv drops the remainder
        x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * c).astype(self.dtype)
        k = kernel.astype(self.dtype).reshape(p * p * c, self.features)
        y = jnp.dot(x, k) + bias.astype(self.dtype)
        return y.reshape(b, gh, gw, self.features)


class ConvParams(nn.Module):
    """Declares a TorchConv-layout (kernel, bias) pair WITHOUT running the
    conv — for heads whose conv fuses into a downstream kernel (the bins
    tail, ops/bins.bins_head_depth). Same param names, shapes, and init as
    TorchConv so checkpoints and converters are layout-identical; pass
    kernel_init/bias_init to preserve a different predecessor's init (e.g.
    flax nn.Conv's lecun_normal + zeros) without changing the layout."""

    features: int
    kernel_size: Sequence[int] = (1, 1)
    kernel_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self, in_features: int):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init or torch_kernel_init,
            (kh, kw, in_features, self.features),
        )
        bias = self.param(
            "bias", self.bias_init or torch_bias_init_for(kh * kw * in_features),
            (self.features,),
        )
        return kernel, bias


class _TorchBN(nn.Module):
    """Torch-exact BatchNorm core (same variable layout as flax nn.BatchNorm:
    params {scale, bias}, batch_stats {mean, var}).

    flax nn.BatchNorm updates the running VARIANCE with the biased batch
    variance; torch.nn.BatchNorm2d normalises with the biased variance but
    tracks the UNBIASED (Bessel-corrected, n/(n-1)) one in running_var
    (torch functional.batch_norm semantics). The factor is tiny for the
    depth model's spatial BNs (n = B*H*W) but it is exactly the kind of
    drift the multi-step trajectory oracle pins — so the update here is
    torch-exact. Pinned by tests/test_trajectory_oracle.py::test_bn_momentum
    against torch.nn.BatchNorm2d(momentum=0.1)."""

    epsilon: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        # flax nn.BatchNorm op order: mul = rsqrt(var + eps) * scale, then
        # (x - mean) * mul + bias — kept so eval-mode outputs are bit-equal
        # to the previous wrapper and the forward oracles' tolerances hold
        d = self.dtype
        mul = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(d)
        return (x.astype(d) - mean.astype(d)) * mul + bias.astype(d)


class BatchNorm(nn.Module):
    """BatchNorm2d matching torch semantics (eps/momentum configurable)."""

    epsilon: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        return _TorchBN(
            epsilon=self.epsilon,
            momentum=self.momentum,
            dtype=self.dtype,
            name="bn",
        )(x, use_running_average)


def drop_path(x, rate: float, deterministic: bool, rng=None):
    """Stochastic depth on the residual branch (per-sample)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x * mask / keep


class SqueezeExcite(nn.Module):
    """EfficientNet SE block: squeeze to se_channels, SiLU, expand, sigmoid.

    ``pooled`` (B,1,1,C) skips the internal mean — used when the fused
    Pallas MBConv head already produced the spatial pool (ops/mbconv_pallas).
    """

    se_channels: int
    dtype: Dtype = jnp.float32
    gate: Callable = jax.nn.sigmoid
    act: Callable = jax.nn.silu

    @nn.compact
    def __call__(self, x, pooled=None, gate_only: bool = False):
        s = pooled if pooled is not None else jnp.mean(
            x, axis=(1, 2), keepdims=True
        )
        s = TorchConv(self.se_channels, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = self.act(s)
        s = TorchConv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(s)
        if gate_only:
            # (B, 1, 1, C) gate for the fused epilogue kernel
            # (ops/se_project_pallas.se_gate_project)
            return self.gate(s)
        return x * self.gate(s)


class SpaceToDepthConv(nn.Module):
    """EXACT rewrite of a 3x3 stride-2 conv as space-to-depth + 2x2 conv.

    XLA's conv path for a C_in=3 stem measures 0.7% MFU at (96,480,640,3)
    (15 ms of the 118 ms encoder forward, scripts/profile_encoder_stages.py):
    the 3-channel input defeats both lane packing and the MXU contracting
    dim. Folding 2x2 pixel blocks into channels (H,W,C)->(H/2,W/2,4C) turns
    the stem into a 2x2 stride-1 conv with a 4x wider contraction on
    half-size spatial maps — the standard TPU space-to-depth stem (MLPerf
    ResNet), here derived for BOTH padding conventions the encoders use:

      * 'tf' (tf_efficientnet_*): SAME on even H/W pads (0,1) -> output i
        reads rows {2i, 2i+1, 2i+2} = s2d blocks {i, i+1}, sub-rows
        {0, 1, 0}: one trailing block of padding, taps at 2*by+sy.
      * 'torch' (torchvision v2): symmetric (1,1) -> rows {2i-1, 2i, 2i+1}
        = blocks {i-1, i}: one leading block of padding, taps at 2*by+sy-1.

    Parameter names, shapes, and init are IDENTICAL to
    ``TorchConv(features, (3,3), (2,2), padding=conv_padding(...))`` — the
    rearrangement happens at apply time — so weight import, BN folding, and
    checkpoints are unaffected, and the rewrite is exact in forward AND
    backward (everything is linear). Requires even H and W; callers fall
    back to TorchConv otherwise (the param trees match).
    """

    features: int
    pad_style: str = "tf"
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, "SpaceToDepthConv needs even H, W"
        kernel = self.param("kernel", torch_kernel_init, (3, 3, c, self.features))
        # pad taps to a 4x4 grid: 'tf' appends the zero row/col, 'torch'
        # prepends it (tap index = 2*by + sy - pad_before).
        if self.pad_style == "tf":
            kp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
            xpad = ((0, 0), (0, 1), (0, 1), (0, 0))
        else:
            kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
            xpad = ((0, 0), (1, 0), (1, 0), (0, 0))
        # (4,4,C,O) -> (by,sy,bx,sx,C,O) -> (by,bx, sy*2C+sx*C+c, O)
        kp = kp.reshape(2, 2, 2, 2, c, self.features)
        kp = kp.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * c, self.features)
        # space-to-depth: channel index = sy*2C + sx*C + c (matches kp)
        xs = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(b, h // 2, w // 2, 4 * c)
        xs = jnp.pad(xs, xpad)
        y = jax.lax.conv_general_dilated(
            xs.astype(self.dtype), kp.astype(self.dtype),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", torch_bias_init_for(9 * c), (self.features,)
            )
            y = y + bias.astype(self.dtype)
        return y


def conv_padding(pad_style: str, kernel_size) -> Any:
    """'tf' -> asymmetric SAME (tf_efficientnet_* variants); 'torch' ->
    symmetric k//2 padding (torchvision efficientnet_v2_*)."""
    if pad_style == "tf":
        return "SAME"
    kh, kw = kernel_size
    return ((kh // 2, kh // 2), (kw // 2, kw // 2))


class ConvBnAct(nn.Module):
    """conv -> BN -> act; with ``fold_bn`` the BN affine is pre-folded into the
    conv weights+bias (inference only — see utils/fold_bn.py)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    bn_eps: float = 1e-3
    act: Callable | None = jax.nn.silu
    pad_style: str = "tf"
    fold_bn: bool = False
    s2d: bool = False  # exact space-to-depth rewrite (3x3 s2, even H/W)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not (self.fold_bn and train), "fold_bn is inference-only"
        if (
            self.s2d
            and not train  # inference-only: the rewrite's backward is slower
            and tuple(self.kernel_size) == (3, 3)
            and tuple(self.strides) == (2, 2)
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            x = SpaceToDepthConv(
                self.features, pad_style=self.pad_style,
                use_bias=self.fold_bn, dtype=self.dtype, name="conv",
            )(x)
        else:
            x = TorchConv(
                self.features, self.kernel_size, self.strides,
                use_bias=self.fold_bn,
                padding=conv_padding(self.pad_style, self.kernel_size),
                dtype=self.dtype, name="conv",
            )(x)
        if not self.fold_bn:
            x = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype, name="bn")(
                x, use_running_average=not train
            )
        if self.act is not None:
            x = self.act(x)
        return x


def _use_se_project_epilogue(block, train: bool, h) -> bool:
    """Fused SE-gate + project + skip epilogue eligibility.

    MEASURED NEGATIVE on chip (scripts/ab_se_project.py, bs=96: 0.47-0.91x
    XLA across the B5 stage shapes, all negative) — XLA's unfused mul+conv+add schedule
    beats the streaming kernel, echoing the fused-MBConv-head result
    (docs/PERF.md). Kept wired for interpreter-mode tests only
    (``se_project_pallas.ENABLE`` flips it on for experiments)."""
    from objcavit_tpu.ops import se_project_pallas as _sp

    return (
        ((_sp.ENABLE and jax.default_backend() == "tpu") or _sp.INTERPRET)
        and block.fold_bn
        and not train
        and _sp.se_project_eligible(
            h.shape[1], h.shape[2], h.shape[3], h.dtype.itemsize
        )
    )


def _se_project_epilogue(block, h, x, se_ch: int, in_ch: int, out_ch: int):
    """SE gate -> ONE streaming Pallas pass (gate * h) @ W_project + skip.

    Identical params and math to SqueezeExcite + ConvBnAct('project') +
    residual add; drop_path is the identity at inference so it is elided.
    """
    from objcavit_tpu.ops import se_project_pallas as _sp

    mid = h.shape[-1]
    gate = SqueezeExcite(se_ch, dtype=block.dtype, name="se")(
        h, gate_only=True
    )  # (B, 1, 1, M)
    kp, bp = _ConvScope(out_ch, (1, 1), name="project")(mid)
    skip = x if (block.stride == 1 and in_ch == out_ch) else None
    return _sp.se_gate_project(
        h,
        gate.reshape(h.shape[0], mid),
        kp.reshape(mid, out_ch).astype(block.dtype),
        bp.astype(jnp.float32),
        skip,
        interpret=_sp.INTERPRET,
    )


class _ConvScope(nn.Module):
    """Declares ConvParams under ``<name>/conv`` — the param tree of a
    folded ConvBnAct — without running the conv (fused-kernel path)."""

    features: int
    kernel_size: Sequence[int] = (1, 1)

    @nn.compact
    def __call__(self, in_features: int):
        return ConvParams(
            self.features, self.kernel_size, name="conv"
        )(in_features)


class MBConv(nn.Module):
    """EfficientNet inverted-residual block (expand -> dw -> SE -> project).

    ``fused_head=True`` (folded inference on TPU, eligible shapes) computes
    expand+SiLU+dw+SiLU+SE-pool in ONE Pallas kernel
    (ops/mbconv_pallas.py) — identical params, identical math; SE gate and
    project stay in XLA which fuses the gate multiply into the project
    read. See docs/PERF.md for the measured pass-structure analysis.
    """

    out_channels: int
    expand_ratio: float
    kernel_size: int
    stride: int
    se_ratio: float = 0.25
    drop_path_rate: float = 0.0
    bn_eps: float = 1e-3
    pad_style: str = "tf"
    fold_bn: bool = False
    fused_head: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from objcavit_tpu.ops import mbconv_pallas as _mp

        in_ch = x.shape[-1]
        mid = int(in_ch * self.expand_ratio)
        k = self.kernel_size
        use_fused = (
            self.fused_head
            and self.fold_bn
            and not train
            and self.expand_ratio != 1
            and self.se_ratio > 0
            and self.pad_style == "tf"  # SAME == symmetric for odd k, s=1
            and _mp.mbconv_eligible(x.shape[1], x.shape[2], in_ch, mid, k,
                                    self.stride)
            and (jax.default_backend() == "tpu" or _mp.INTERPRET)
        )
        h = x
        if use_fused:
            ke, be = _ConvScope(mid, (1, 1), name="expand")(in_ch)
            kd, bd = ConvParams(mid, (k, k), name="dw_conv")(1)
            h, pool = _mp.mbconv_expand_dw_pool(
                x.astype(self.dtype),
                ke.reshape(in_ch, mid).astype(self.dtype),
                be.astype(jnp.float32),
                kd.astype(self.dtype),
                bd.astype(jnp.float32),
                ksize=k,
                interpret=_mp.INTERPRET,
            )
            pooled = (pool / (x.shape[1] * x.shape[2]))[:, None, None, :]
            pooled = pooled.astype(self.dtype)
            se_ch = max(1, int(in_ch * self.se_ratio))
            h = SqueezeExcite(se_ch, dtype=self.dtype, name="se")(
                h, pooled=pooled
            )
        else:
            if self.expand_ratio != 1:
                h = ConvBnAct(mid, (1, 1), bn_eps=self.bn_eps,
                              fold_bn=self.fold_bn,
                              dtype=self.dtype, name="expand")(h, train)
            k2 = (k, k)
            h = TorchConv(
                mid, k2, (self.stride, self.stride),
                padding=conv_padding(self.pad_style, k2),
                feature_group_count=mid, use_bias=self.fold_bn,
                dtype=self.dtype, name="dw_conv",
            )(h)
            if not self.fold_bn:
                h = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype,
                              name="dw_bn")(h, use_running_average=not train)
            h = jax.nn.silu(h)
            if self.se_ratio > 0:
                se_ch = max(1, int(in_ch * self.se_ratio))
                if _use_se_project_epilogue(self, train, h):
                    return _se_project_epilogue(
                        self, h, x, se_ch, in_ch, self.out_channels
                    )
                h = SqueezeExcite(se_ch, dtype=self.dtype, name="se")(h)
        h = ConvBnAct(self.out_channels, (1, 1), bn_eps=self.bn_eps, act=None,
                      fold_bn=self.fold_bn, dtype=self.dtype,
                      name="project")(h, train)
        if self.stride == 1 and in_ch == self.out_channels:
            rng = self.make_rng("droppath") if (train and self.drop_path_rate > 0) else None
            h = drop_path(h, self.drop_path_rate, not train, rng)
            h = h + x
        return h


class DepthwiseSeparable(nn.Module):
    """EfficientNet stage-0 block: dw conv -> SE -> pw project (no expansion)."""

    out_channels: int
    kernel_size: int
    stride: int
    se_ratio: float = 0.25
    drop_path_rate: float = 0.0
    bn_eps: float = 1e-3
    pad_style: str = "tf"
    fold_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        k2 = (self.kernel_size, self.kernel_size)
        h = TorchConv(
            in_ch, k2, (self.stride, self.stride),
            padding=conv_padding(self.pad_style, k2),
            feature_group_count=in_ch, use_bias=self.fold_bn, dtype=self.dtype,
            name="dw_conv",
        )(x)
        if not self.fold_bn:
            h = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype, name="dw_bn")(
                h, use_running_average=not train
            )
        h = jax.nn.silu(h)
        if self.se_ratio > 0:
            se_ch = max(1, int(in_ch * self.se_ratio))
            if _use_se_project_epilogue(self, train, h):
                return _se_project_epilogue(
                    self, h, x, se_ch, in_ch, self.out_channels
                )
            h = SqueezeExcite(se_ch, dtype=self.dtype, name="se")(h)
        h = ConvBnAct(self.out_channels, (1, 1), bn_eps=self.bn_eps, act=None,
                      fold_bn=self.fold_bn, dtype=self.dtype,
                      name="project")(h, train)
        if self.stride == 1 and in_ch == self.out_channels:
            rng = self.make_rng("droppath") if (train and self.drop_path_rate > 0) else None
            h = drop_path(h, self.drop_path_rate, not train, rng)
            h = h + x
        return h


class FusedMBConv(nn.Module):
    """EfficientNet-V2 fused block: full 3x3 conv expand -> project (no SE)."""

    out_channels: int
    expand_ratio: float
    kernel_size: int
    stride: int
    drop_path_rate: float = 0.0
    bn_eps: float = 1e-3
    pad_style: str = "tf"
    fold_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = int(in_ch * self.expand_ratio)
        if self.expand_ratio != 1:
            h = ConvBnAct(mid, (self.kernel_size,) * 2, (self.stride,) * 2,
                          bn_eps=self.bn_eps, pad_style=self.pad_style,
                          fold_bn=self.fold_bn,
                          dtype=self.dtype, name="expand")(x, train)
            h = ConvBnAct(self.out_channels, (1, 1), bn_eps=self.bn_eps, act=None,
                          fold_bn=self.fold_bn,
                          dtype=self.dtype, name="project")(h, train)
        else:
            h = ConvBnAct(self.out_channels, (self.kernel_size,) * 2,
                          (self.stride,) * 2, bn_eps=self.bn_eps,
                          pad_style=self.pad_style, fold_bn=self.fold_bn,
                          dtype=self.dtype, name="project")(x, train)
        if self.stride == 1 and in_ch == self.out_channels:
            rng = self.make_rng("droppath") if (train and self.drop_path_rate > 0) else None
            h = drop_path(h, self.drop_path_rate, not train, rng)
            h = h + x
        return h
