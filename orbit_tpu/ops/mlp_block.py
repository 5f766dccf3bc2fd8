"""Fused transformer MLP half-block for TPU (Pallas).

Computes ``y = x + fc2(gelu(fc1(LayerNorm(x))))`` in one kernel. Under XLA
the (B, S, 4D) hidden tensor materialises in HBM between the two GEMMs
(~314 MB of traffic per ViT-B/32 encoder layer at batch 512) and the
LayerNorm output round-trips as well; fusing the whole half-block keeps
everything in VMEM. Measured e2e on ViT-B/32 @512 (v5e), stacked on the
fused attention kernel: 44.8 -> 38.8 ms/it (99.8 -> 115.2 TF/s, 58.5% MFU;
PERF.md). Both weight matrices ride VMEM-resident across grid cells
(constant index_map, ~9.4 MB for ViT-B).

GELU is the exact (erf) form the timm ViTs use (reference:
model/feature_extractors.py:49-64 -> timm vit_* with act_layer=GELU);
Mosaic has no erf primitive, so the kernel evaluates the Abramowitz &
Stegun 7.1.26 polynomial (measured max abs err ~2e-6 in f32 — ~1000x below
bf16 resolution; parity-tested against jax.nn.gelu(approximate=False)).

Gradients: ``jax.custom_vjp`` recomputes the XLA reference in the backward,
so meta-training (LITE ``learn_extractor``) differentiates the exact math;
the Pallas path accelerates every forward. FiLM note: norm2's scale/bias
are FiLM-tagged leaves — they arrive here as values, so task-adapted films
flow through the kernel unchanged.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_B = 8


def _erf_poly(x):
    # Abramowitz & Stegun 7.1.26 (f32), |err| <= 1.5e-7
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _mlp_kernel(ln_eps, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref):
    nb, s, d = x_ref.shape
    gs = nb * s
    x = x_ref[...].reshape(gs, d)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + ln_eps) * g_ref[0][None, :]
          + b_ref[0][None, :]).astype(x_ref.dtype)
    h = (jax.lax.dot_general(
        xn, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0][None, :])
    h = (0.5 * h * (1.0 + _erf_poly(h * (1.0 / math.sqrt(2.0))))
         ).astype(x_ref.dtype)
    y = (jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0][None, :] + xf)
    out_ref[...] = y.reshape(nb, s, d).astype(out_ref.dtype)


def _pallas_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps,
                interpret=False):
    n, s, d = x.shape
    nb = min(_BLOCK_B, n)
    pad = (-n) % nb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))

    def row8(t, dt):
        # Mosaic wants block sublane dims >= 8: ship vectors as 8-row bcasts
        return jnp.broadcast_to(t.astype(dt)[None, :], (8, t.shape[0]))

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, ln_eps),
        out_shape=jax.ShapeDtypeStruct((n + pad, s, d), x.dtype),
        grid=((n + pad) // nb,),
        in_specs=[
            pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((8, d)), const((8, d)),
            const(w1.shape), const((8, w1.shape[1])),
            const(w2.shape), const((8, d)),
        ],
        out_specs=pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, row8(ln_scale, jnp.float32), row8(ln_bias, jnp.float32),
      w1.astype(x.dtype), row8(b1, jnp.float32),
      w2.astype(x.dtype), row8(b2, jnp.float32))
    return out[:n] if pad else out


def xla_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps):
    """XLA reference: identical math (f32 LN/bias/residual, exact-erf gelu,
    dtype-precision GEMMs). Backward path and non-TPU forward."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + ln_eps)
          * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
          ).astype(x.dtype)
    h = (jnp.dot(xn, w1.astype(x.dtype)).astype(jnp.float32)
         + b1.astype(jnp.float32))
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    y = (jnp.dot(h, w2.astype(x.dtype)).astype(jnp.float32)
         + b2.astype(jnp.float32) + xf)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps,
               interpret=False):
    return _pallas_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps,
                       interpret)


def _fused_mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps, interpret):
    return (_pallas_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps,
                        interpret),
            (x, ln_scale, ln_bias, w1, b1, w2, b2))


def _fused_mlp_bwd(ln_eps, interpret, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: xla_mlp_block(*a, ln_eps), x, ln_scale, ln_bias,
        w1, b1, w2, b2)
    return vjp(g)


_fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def fused_mlp_block(x: jax.Array, ln_scale, ln_bias, w1, b1, w2, b2, *,
                    ln_eps: float = 1e-6, impl: str = "auto") -> jax.Array:
    """``x + fc2(gelu(fc1(LayerNorm(x))))`` in one op.

    x: (B, S, D); ln_scale/ln_bias: (D,); w1: (D, hidden); w2: (hidden, D).
    impl: "auto" (fused Pallas on TPU, XLA elsewhere), "fused", "interpret"
    (CPU-testable), or "xla".
    """
    d = x.shape[-1]
    if w1.shape[0] != d or w2.shape[1] != d or w1.shape[1] != w2.shape[0]:
        raise ValueError(f"mlp weight shapes {w1.shape}/{w2.shape} do not "
                         f"chain with token dim {d}")
    from orbit_tpu.ops import tiny_attention as _ta
    if _ta._IMPL_OVERRIDE is not None:  # MACs analysis forces "xla"
        impl = _ta._IMPL_OVERRIDE
    if impl == "auto":
        impl = "fused" if jax.default_backend() == "tpu" else "xla"
    if impl in ("fused", "interpret", "pallas"):
        return _fused_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps,
                          impl == "interpret")
    return xla_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps)
