"""Fused MBConv-tail depthwise op for TPU (Pallas).

Computes ``y = act2(a2 * dwconv(act1(a1 * x + b1), w) + b2)`` — the
BN(affine-folded)+SiLU glue on BOTH sides of a depthwise conv — in one
kernel. This is EfficientNet's hot tail: the round-4 bisection
(scripts/bench_effnet_bisect.py, PERF.md) measured the depthwise convs at
55% and the BN+SiLU glue at 28% of B0's eval forward even after the eval-BN
affine fold, because XLA lowers ``feature_group_count=C`` convs onto the
MXU as 1-wide contractions and round-trips the activations through HBM
around them.

The kernel runs the depthwise conv on the VPU where it belongs: one grid
cell per image holds the full (padded) spatial extent in VMEM with channels
on lanes, applies the pre-affine+SiLU once (pad positions masked to the
TF-SAME zeros via an iota mask), accumulates the K*K shifted multiply-adds
in f32, and applies the post-affine+SiLU before the single HBM write — the
activations never round-trip between the glue ops and the conv.

Reference parity: timm's ``Conv2dSame`` depthwise + BatchNormAct2d(SiLU)
pairs inside EfficientNet blocks (reference: model/feature_extractors.py
37-79 -> timm efficientnet_b0 / tf_efficientnetv2_s_in21ft1k).

Gradients: ``jax.custom_vjp`` whose backward differentiates the XLA
reference recompute (house pattern, ops/mlp_block.py) — the fused path is
an eval-forward optimisation; meta-training BN runs batch statistics and
never reaches it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orbit_tpu.ops.vma import align_vma, match_cotangent_vma, out_struct

# Full-spatial blocks for the early high-resolution layers need more than
# Mosaic's 16 MB default scoped-VMEM budget (f32 activation + f32
# accumulator at 114x114x96 is ~10 MB before double-buffering).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def tf_same_pads(in_size: int, k: int, s: int):
    """TF SAME padding (lo, hi) for one spatial dim (timm Conv2dSame)."""
    out = -(-in_size // s)
    pad = max((out - 1) * s + k - in_size, 0)
    return pad // 2, pad - pad // 2


def _silu(x):
    return x * jax.nn.sigmoid(x)


def xla_fused_dw(x, w, a1, b1, a2, b2, stride: int, act1: bool, act2: bool):
    """XLA reference: identical math (f32 affines/SiLU, bf16 conv operands,
    f32 conv accumulation). Non-TPU forward and the custom_vjp backward."""
    f32 = jnp.float32
    h = x.astype(f32) * a1.astype(f32) + b1.astype(f32)
    if act1:
        h = _silu(h)
    h = h.astype(x.dtype)
    c = x.shape[-1]
    # conv operands rounded to compute dtype, then convolved in f32: the
    # same math as bf16 operands with an f32 accumulator (what the Pallas
    # kernel does), and — unlike a mixed-dtype preferred_element_type conv —
    # it has a well-defined AD transpose (the f32 cotangent would otherwise
    # meet a bf16 operand inside conv's transpose rule and fail to lower)
    y = jax.lax.conv_general_dilated(
        h.astype(f32), w.astype(x.dtype).astype(f32),
        window_strides=(stride, stride),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    y = y * a2.astype(f32) + b2.astype(f32)
    if act2:
        y = _silu(y)
    return y.astype(x.dtype)


def _dw_kernel(k, h, wd, ph_lo, pw_lo, act1, act2,
               x_ref, w_ref, a1_ref, b1_ref, a2_ref, b2_ref, o_ref):
    """One image, full padded spatial extent, all channels.

    x_ref: (1, Hp, Wp, C) zero-padded input (PRE-activation: the pad values
    are garbage after the affine and are zeroed by the iota mask — TF SAME
    pads the dw input with zeros AFTER the preceding BN+SiLU).
    w_ref: (8*ceil(K^2/8), C) depthwise taps, row di*K+dj.
    o_ref: (1, H, W, C) with H=Hp-K+1, W=Wp-K+1 (stride 1).
    """
    f32 = jnp.float32
    hp, wp = x_ref.shape[1], x_ref.shape[2]
    act = x_ref[0].astype(f32) * a1_ref[0] + b1_ref[0]
    if act1:
        act = _silu(act)
    # TF-SAME zero padding: positions outside the original image are zero
    ii = jax.lax.broadcasted_iota(jnp.int32, (hp, wp, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (hp, wp, 1), 1)
    valid = ((ii >= ph_lo) & (ii < ph_lo + h)
             & (jj >= pw_lo) & (jj < pw_lo + wd))
    act = jnp.where(valid, act, 0.0).astype(x_ref.dtype)

    oh, ow = o_ref.shape[1], o_ref.shape[2]
    acc = jnp.zeros((oh, ow, act.shape[-1]), f32)
    for di in range(k):
        for dj in range(k):
            sl = jax.lax.slice(act, (di, dj, 0),
                               (di + oh, dj + ow, act.shape[-1]))
            acc = acc + sl.astype(f32) * w_ref[di * k + dj].astype(f32)
    y = acc * a2_ref[0] + b2_ref[0]
    if act2:
        y = _silu(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pallas_fused_dw(x, w, a1, b1, a2, b2, stride, act1, act2,
                     interpret=False):
    n, h, wd, c = x.shape
    k = w.shape[0]
    ph_lo, ph_hi = tf_same_pads(h, k, stride)
    pw_lo, pw_hi = tf_same_pads(wd, k, stride)
    xp = jnp.pad(x, ((0, 0), (ph_lo, ph_hi), (pw_lo, pw_hi), (0, 0)))
    hp, wp = h + ph_lo + ph_hi, wd + pw_lo + pw_hi
    oh, ow = -(-h // stride), -(-wd // stride)

    # taps as (rows8, C): row di*K+dj holds w[di, dj, 0, :]
    rows = -(-(k * k) // 8) * 8
    wt = jnp.zeros((rows, c), jnp.float32).at[: k * k].set(
        w.reshape(k * k, c).astype(jnp.float32)).astype(x.dtype)

    def row8(t):
        return jnp.broadcast_to(t.astype(jnp.float32)[None, :], (8, c))

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_dw_kernel, k, h, wd, ph_lo, pw_lo, act1, act2),
        out_shape=out_struct((n, oh, ow, c), x.dtype, x, w, a1, b1, a2, b2),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const((rows, c)),
            const((8, c)), const((8, c)), const((8, c)), const((8, c)),
        ],
        out_specs=pl.BlockSpec((1, oh, ow, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(*align_vma(xp, wt, row8(a1), row8(b1), row8(a2), row8(b2)))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _fused_dw(x, w, a1, b1, a2, b2, stride, act1, act2, interpret=False):
    return _pallas_fused_dw(x, w, a1, b1, a2, b2, stride, act1, act2,
                            interpret)


def _fused_dw_fwd(x, w, a1, b1, a2, b2, stride, act1, act2, interpret):
    return (_pallas_fused_dw(x, w, a1, b1, a2, b2, stride, act1, act2,
                             interpret),
            (x, w, a1, b1, a2, b2))


def _fused_dw_bwd(stride, act1, act2, interpret, res, g):
    x, w, a1, b1, a2, b2 = res
    _, vjp = jax.vjp(
        lambda *args: xla_fused_dw(*args, stride, act1, act2),
        x, w, a1, b1, a2, b2)
    cts = vjp(g.astype(x.dtype))
    primals = (x, w, a1, b1, a2, b2)
    return tuple(match_cotangent_vma(c, p) for c, p in zip(cts, primals))


_fused_dw.defvjp(_fused_dw_fwd, _fused_dw_bwd)


def fused_dw_act(x: jax.Array, w: jax.Array, a1, b1, a2, b2, *,
                 stride: int = 1, act1: bool = True, act2: bool = True,
                 impl: str = "auto") -> jax.Array:
    """``act2(a2 * dwconv(act1(a1*x + b1), w, SAME, stride) + b2)``.

    x: (N, H, W, C) NHWC; w: (K, K, 1, C) depthwise taps;
    a1/b1/a2/b2: (C,) folded BN affines (pass ones/zeros for identity);
    act1/act2: apply SiLU after the respective affine.
    impl: "auto" (Pallas on TPU for stride 1, XLA elsewhere), "pallas",
    "interpret" (CPU-testable), or "xla".
    """
    if w.shape[-1] != x.shape[-1] or w.shape[2] != 1:
        raise ValueError(f"depthwise taps {w.shape} do not match C="
                         f"{x.shape[-1]}")
    from orbit_tpu.ops import tiny_attention as _ta
    if _ta._IMPL_OVERRIDE is not None:  # MACs analysis forces "xla"
        impl = _ta._IMPL_OVERRIDE
    if impl == "auto":
        impl = ("pallas" if jax.default_backend() == "tpu" and stride == 1
                else "xla")
    if impl in ("pallas", "interpret") and stride == 1:
        return _fused_dw(x, w, a1, b1, a2, b2, stride, act1, act2,
                         impl == "interpret")
    return xla_fused_dw(x, w, a1, b1, a2, b2, stride, act1, act2)
