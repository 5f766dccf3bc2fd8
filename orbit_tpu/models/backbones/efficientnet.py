"""EfficientNet-B0 and EfficientNetV2-S in Flax, NHWC, TF-SAME padding.

Capability parity with the reference's timm backbones
(reference: model/feature_extractors.py:39-48):
- ``efficientnet_b0``   = timm tf_efficientnet_b0        (output 1280)
- ``efficientnet_v2_s`` = timm tf_efficientnetv2_s_in21k (output 1280)

The "tf" variants use TensorFlow SAME padding and BN eps 1e-3; XLA's native
``padding='SAME'`` convolution is exactly TF SAME, so no Conv2dSame shim is
needed on TPU. All convs are NHWC (the TPU-native layout).

Block taxonomy (mirroring timm so weight conversion is mechanical):
- ConvBnAct     ("cn"): conv-bn1-silu (+residual)
- DepthwiseSep  ("ds"): dw conv-bn1-silu, SE, pw conv-bn2 (+residual)
- EdgeResidual  ("er"): 3x3 expand conv-bn1-silu, pw conv-bn2 (+residual)
- InvertedResid ("ir"): pw expand-bn1-silu, dw-bn2-silu, SE, pw-bn3 (+residual)

FiLM spec parity (reference: model/film.py:38-56): tag bn1 of
EdgeResidual/ConvBnAct, bn2 of InvertedResidual, and the root bn1 (stem) and
bn2 (head). DepthwiseSeparable blocks are NOT tagged (the reference's
name-filter skips them). FiLM is applied by overriding those BN scale/bias
leaves in the param tree before ``apply``.

BatchNorm semantics: eval mode (running stats) everywhere except
meta-training with ``learn_extractor`` (reference:
model/few_shot_recognisers.py:176-183) — pass ``train=True`` and make the
``batch_stats`` collection mutable only in that case.
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from orbit_tpu.models.backbones.masked_bn import MaskedBatchNorm

Dtype = Any
BN_EPS_TF = 1e-3
BN_MOMENTUM = 0.9  # timm default decay 0.1 -> flax momentum 0.9

# Depthwise conv lowering. XLA's grouped-conv path drives the 128x128 MXU
# with 1-wide contractions and measured as ~51% of B0's eval forward time
# (scripts/bench_effnet_bisect.py). "shift" lowers the depthwise to K^2
# shifted strided-slice multiply-adds — identical math (same sum of
# products, same TF-SAME pads) — but MEASURED 3x SLOWER on v5e (15.9 vs
# 5.2 ms/it @ batch 128: XLA materialises each shifted slice instead of
# fusing the K^2 reads; scripts/bench_effnet_variants.py). It stays
# selectable for measurement; "xla" is the production default.
DW_IMPL = "xla"

# Eval-path MBConv-tail fusion: route BN(affine)+SiLU + stride-1 depthwise
# + BN(affine)+SiLU through the fused Pallas kernel
# (ops/depthwise.fused_dw_act) instead of the composed XLA ops. Selectable
# for measurement (scripts/bench_effnet_variants.py --fused); see PERF.md
# for the measured verdict and the per-shape analysis.
DW_FUSED = False


# TF SAME padding shared with the Pallas MBConv-tail kernel so the two
# lowerings can never disagree on padding (ops/depthwise.py)
from orbit_tpu.ops.depthwise import tf_same_pads as _tf_same_pads


class DepthwiseConv(nn.Module):
    """Depthwise KxK conv, NHWC, TF-SAME, no bias.

    Param tree matches ``nn.Conv(feature_group_count=C)`` — one "kernel" of
    shape (K, K, 1, C) — so checkpoints and the timm converter see no
    difference. See ``DW_IMPL`` for the lowering choice.
    """

    kernel: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        k, s, c = self.kernel, self.stride, x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, 1, c), jnp.float32).astype(self.dtype)
        if return_weights:
            # for callers that fuse the conv with its BN/SiLU neighbours
            # (ops/depthwise.fused_dw_act); same param tree either way
            return w
        if DW_IMPL == "xla":
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(s, s), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)
        return _depthwise_shift(x, w, s)


def _depthwise_shift(x, w, s: int):
    """y[n,i,j,c] = sum_{dh,dw} x_pad[n, i*s+dh, j*s+dw, c] * w[dh,dw,0,c]."""
    k = w.shape[0]
    h, wd = x.shape[1], x.shape[2]
    plo_h, phi_h = _tf_same_pads(h, k, s)
    plo_w, phi_w = _tf_same_pads(wd, k, s)
    xp = jnp.pad(x, ((0, 0), (plo_h, phi_h), (plo_w, phi_w), (0, 0)))
    out_h, out_w = -(-h // s), -(-wd // s)
    y = None
    for dh in range(k):
        for dw in range(k):
            sl = xp[:, dh:dh + (out_h - 1) * s + 1:s,
                    dw:dw + (out_w - 1) * s + 1:s, :]
            term = sl * w[dh, dw, 0]
            y = term if y is None else y + term
    return y


def _bn(eps: float, dtype, name: str):
    # row-mask-aware BN: padded episode rows are excluded from batch
    # statistics during learn_extractor meta-training (masked_bn.py)
    return MaskedBatchNorm(momentum=BN_MOMENTUM, epsilon=eps, dtype=dtype,
                           name=name)


class SqueezeExcite(nn.Module):
    """SE: global mean -> 1x1 reduce -> SiLU -> 1x1 expand -> sigmoid gate."""

    rd_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_channels, (1, 1), dtype=self.dtype, name="conv_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="conv_expand")(s)
        return x * nn.sigmoid(s)


class ConvBnAct(nn.Module):
    out_chs: int
    kernel: int
    stride: int
    bn_eps: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        shortcut = x
        x = nn.Conv(self.out_chs, (self.kernel, self.kernel), strides=self.stride,
                    padding="SAME", use_bias=False, dtype=self.dtype, name="conv")(x)
        x = _bn(self.bn_eps, self.dtype, "bn1")(x, use_running_average=not train, mask=mask)
        x = nn.silu(x)
        if self.stride == 1 and shortcut.shape[-1] == self.out_chs:
            x = x + shortcut
        return x


class DepthwiseSeparable(nn.Module):
    out_chs: int
    kernel: int
    stride: int
    se_ratio: float
    bn_eps: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        shortcut = x
        in_chs = x.shape[-1]
        dw = DepthwiseConv(self.kernel, self.stride, dtype=self.dtype,
                           name="conv_dw")
        bn1 = _bn(self.bn_eps, self.dtype, "bn1")
        if DW_FUSED and not train and self.stride == 1:
            from orbit_tpu.ops.depthwise import fused_dw_act
            a1, b1 = bn1(x, use_running_average=True, fold=True)
            ident = jnp.ones_like(a1), jnp.zeros_like(b1)
            x = fused_dw_act(x, dw(x, return_weights=True), *ident, a1, b1,
                             stride=self.stride, act1=False, act2=True)
        else:
            x = dw(x)
            x = bn1(x, use_running_average=not train, mask=mask)
            x = nn.silu(x)
        if self.se_ratio > 0:
            x = SqueezeExcite(max(1, int(in_chs * self.se_ratio)), dtype=self.dtype, name="se")(x)
        x = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype, name="conv_pw")(x)
        x = _bn(self.bn_eps, self.dtype, "bn2")(x, use_running_average=not train, mask=mask)
        if self.stride == 1 and in_chs == self.out_chs:
            x = x + shortcut
        return x


class EdgeResidual(nn.Module):
    out_chs: int
    kernel: int
    stride: int
    exp_ratio: float
    bn_eps: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        shortcut = x
        in_chs = x.shape[-1]
        mid = int(in_chs * self.exp_ratio)
        x = nn.Conv(mid, (self.kernel, self.kernel), strides=self.stride,
                    padding="SAME", use_bias=False, dtype=self.dtype, name="conv_exp")(x)
        x = _bn(self.bn_eps, self.dtype, "bn1")(x, use_running_average=not train, mask=mask)
        x = nn.silu(x)
        x = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype, name="conv_pwl")(x)
        x = _bn(self.bn_eps, self.dtype, "bn2")(x, use_running_average=not train, mask=mask)
        if self.stride == 1 and in_chs == self.out_chs:
            x = x + shortcut
        return x


class InvertedResidual(nn.Module):
    out_chs: int
    kernel: int
    stride: int
    exp_ratio: float
    se_ratio: float
    bn_eps: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        shortcut = x
        in_chs = x.shape[-1]
        mid = int(in_chs * self.exp_ratio)
        x = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="conv_pw")(x)
        bn1 = _bn(self.bn_eps, self.dtype, "bn1")
        dw = DepthwiseConv(self.kernel, self.stride, dtype=self.dtype,
                           name="conv_dw")
        bn2 = _bn(self.bn_eps, self.dtype, "bn2")
        if DW_FUSED and not train and self.stride == 1:
            from orbit_tpu.ops.depthwise import fused_dw_act
            a1, b1 = bn1(x, use_running_average=True, fold=True)
            a2, b2 = bn2(x, use_running_average=True, fold=True)
            x = fused_dw_act(x, dw(x, return_weights=True), a1, b1, a2, b2,
                             stride=self.stride, act1=True, act2=True)
        else:
            x = bn1(x, use_running_average=not train, mask=mask)
            x = nn.silu(x)
            x = dw(x)
            x = bn2(x, use_running_average=not train, mask=mask)
            x = nn.silu(x)
        if self.se_ratio > 0:
            x = SqueezeExcite(max(1, int(in_chs * self.se_ratio)), dtype=self.dtype, name="se")(x)
        x = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype, name="conv_pwl")(x)
        x = _bn(self.bn_eps, self.dtype, "bn3")(x, use_running_average=not train, mask=mask)
        if self.stride == 1 and in_chs == self.out_chs:
            x = x + shortcut
        return x


# Stage definitions: (block_type, repeats, kernel, stride, exp_ratio, out_chs, se_ratio)
B0_ARCH = [
    ("ds", 1, 3, 1, 1.0, 16, 0.25),
    ("ir", 2, 3, 2, 6.0, 24, 0.25),
    ("ir", 2, 5, 2, 6.0, 40, 0.25),
    ("ir", 3, 3, 2, 6.0, 80, 0.25),
    ("ir", 3, 5, 1, 6.0, 112, 0.25),
    ("ir", 4, 5, 2, 6.0, 192, 0.25),
    ("ir", 1, 3, 1, 6.0, 320, 0.25),
]
V2_S_ARCH = [
    ("cn", 2, 3, 1, 1.0, 24, 0.0),
    ("er", 4, 3, 2, 4.0, 48, 0.0),
    ("er", 4, 3, 2, 4.0, 64, 0.0),
    ("ir", 6, 3, 2, 4.0, 128, 0.25),
    ("ir", 9, 3, 1, 6.0, 160, 0.25),
    ("ir", 15, 3, 2, 6.0, 256, 0.25),
]

def _make_block(btype, k, s, e, c, se, eps, dt, name):
    if btype == "cn":
        return ConvBnAct(c, k, s, eps, dtype=dt, name=name)
    if btype == "ds":
        return DepthwiseSeparable(c, k, s, se, eps, dtype=dt, name=name)
    if btype == "er":
        return EdgeResidual(c, k, s, e, eps, dtype=dt, name=name)
    if btype == "ir":
        return InvertedResidual(c, k, s, e, se, eps, dtype=dt, name=name)
    raise ValueError(btype)


class EfficientNet(nn.Module):
    """Generic EfficientNet trunk: stem -> stages -> 1x1 head -> global pool."""

    arch: Sequence[Tuple] = tuple(B0_ARCH)
    stem_chs: int = 32
    head_chs: int = 1280
    bn_eps: float = BN_EPS_TF
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        x = nn.Conv(self.stem_chs, (3, 3), strides=2, padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv_stem")(x)
        x = _bn(self.bn_eps, self.dtype, "bn1")(x, use_running_average=not train, mask=mask)
        x = nn.silu(x)

        for si, (btype, repeats, k, stride, exp, out_chs, se) in enumerate(self.arch):
            for bi in range(repeats):
                s = stride if bi == 0 else 1
                block = _make_block(btype, k, s, exp, out_chs, se, self.bn_eps,
                                    self.dtype, f"blocks_{si}_{bi}")
                x = block(x, train=train, mask=mask)

        x = nn.Conv(self.head_chs, (1, 1), use_bias=False, dtype=self.dtype, name="conv_head")(x)
        x = _bn(self.bn_eps, self.dtype, "bn2")(x, use_running_average=not train, mask=mask)
        x = nn.silu(x)
        return x.mean(axis=(1, 2)).astype(jnp.float32)  # (N, head_chs)


def efficientnet_film_spec(arch: Sequence[Tuple]) -> List[Tuple[Tuple[str, ...], int]]:
    """FiLM-able BN scale/bias leaves (reference: model/film.py:38-56).

    Tags: root bn1 (stem, size stem_chs) and bn2 (head), ConvBnAct bn1,
    EdgeResidual bn1 (on the expanded width), InvertedResidual bn2 (expanded
    width). DepthwiseSeparable blocks are skipped, matching the reference.
    """
    spec: List[Tuple[Tuple[str, ...], int]] = []

    def add(path_prefix: Tuple[str, ...], size: int):
        spec.append((path_prefix + ("scale",), size))
        spec.append((path_prefix + ("bias",), size))

    stem = {tuple(B0_ARCH): 32, tuple(V2_S_ARCH): 24}[tuple(arch)]
    add(("bn1",), stem)
    add(("bn2",), 1280)
    in_chs = stem
    for si, (btype, repeats, k, stride, exp, out_chs, se) in enumerate(arch):
        for bi in range(repeats):
            if btype == "cn":
                add((f"blocks_{si}_{bi}", "bn1"), out_chs)
            elif btype == "er":
                add((f"blocks_{si}_{bi}", "bn1"), int(in_chs * exp))
            elif btype == "ir":
                add((f"blocks_{si}_{bi}", "bn2"), int(in_chs * exp))
            # "ds": not tagged
            in_chs = out_chs
    return spec


def create_efficientnet(name: str, dtype: Dtype = jnp.float32):
    """Factory: name -> (module, output_size, film_spec)."""
    if name == "efficientnet_b0":
        m = EfficientNet(arch=tuple(B0_ARCH), stem_chs=32, head_chs=1280, dtype=dtype)
        return m, 1280, efficientnet_film_spec(B0_ARCH)
    if name == "efficientnet_v2_s":
        m = EfficientNet(arch=tuple(V2_S_ARCH), stem_chs=24, head_chs=1280, dtype=dtype)
        return m, 1280, efficientnet_film_spec(V2_S_ARCH)
    raise ValueError(f"Unknown EfficientNet variant: {name}")
