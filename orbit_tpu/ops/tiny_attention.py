"""Fused multi-head self-attention for tiny sequences (Pallas, TPU).

Why this kernel exists. The ViT backbones run attention over S=50 tokens
(49 patches + cls at 224px/patch32 — reference: timm vit_*_patch32_224 used
by model/feature_extractors.py:49-64). At that size attention is ~1% of the
model's FLOPs but, measured on a v5e, ~40% of its wall time under plain XLA:
the (B,S,H,hd)->(B,H,S,hd) transposes, the materialised (B*H,S,S) score
tensor, and the softmax each round-trip HBM, and none of it amortises over a
50-token sequence. This kernel reads the raw qkv projection once per batch
tile, runs per-head scores -> softmax -> AV entirely in VMEM, and writes the
attention output once. No flash-attention style online softmax is needed:
S=50 scores for a whole batch tile fit in VMEM trivially.

Layout contract: ``qkv`` is the raw output of the fused qkv Dense,
shape (B, S, 3*D), whose columns are ordered [q | k | v] with heads
contiguous inside each (i.e. the (3, H, hd) reshape order that both timm and
``orbit_tpu.models.backbones.vit.Attention`` use). Head slices are therefore
static 64-aligned lane slices - no transposes anywhere.

Gradients: the op carries a ``jax.custom_vjp`` whose backward recomputes
attention with the XLA reference implementation and differentiates that, so
meta-training through the backbone (LITE) works unchanged; the Pallas path
accelerates the forward (the entire CLU-VE eval, and the fwd of training).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Batch rows per grid cell. 8 frames x 50 tokens x 2304 cols (bf16) is a
# ~1.8 MB qkv block + 0.6 MB out block: comfortably inside VMEM with double
# buffering, large enough to amortise DMA issue overhead.
_BLOCK_B = 8


def _attn_kernel(num_heads: int, qkv_ref, out_ref):
    nb, s, d3 = qkv_ref.shape
    d = d3 // 3
    hd = d // num_heads
    scale = 1.0 / math.sqrt(hd)
    for b in range(nb):
        for h in range(num_heads):
            q = qkv_ref[b, :, h * hd:(h + 1) * hd]
            k = qkv_ref[b, :, d + h * hd:d + (h + 1) * hd]
            v = qkv_ref[b, :, 2 * d + h * hd:2 * d + (h + 1) * hd]
            # scores[s1, s2] = <q[s1], k[s2]> : contract hd with hd (NT form,
            # no explicit transpose), f32 accumulation on the MXU.
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp(scores - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            out = jnp.dot(p.astype(qkv_ref.dtype), v,
                          preferred_element_type=jnp.float32)
            out_ref[b, :, h * hd:(h + 1) * hd] = out.astype(out_ref.dtype)


def _pallas_attention(qkv: jax.Array, num_heads: int,
                      interpret: bool = False) -> jax.Array:
    n, s, d3 = qkv.shape
    d = d3 // 3
    nb = min(_BLOCK_B, n)
    pad = (-n) % nb
    if pad:
        qkv = jnp.pad(qkv, ((0, pad), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, num_heads),
        out_shape=jax.ShapeDtypeStruct((n + pad, s, d), qkv.dtype),
        grid=((n + pad) // nb,),
        in_specs=[pl.BlockSpec((nb, s, d3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv)
    return out[:n] if pad else out


def xla_attention(qkv: jax.Array, num_heads: int) -> jax.Array:
    """Reference implementation (XLA): identical math, used for the backward
    pass, for non-TPU backends, and as the parity oracle in tests."""
    n, s, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    parts = qkv.reshape(n, s, 3, num_heads, hd)
    q, k, v = parts[:, :, 0], parts[:, :, 1], parts[:, :, 2]
    out = jax.nn.dot_product_attention(q, k, v)  # scale 1/sqrt(hd) internal
    return out.reshape(n, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fused_attention(qkv: jax.Array, num_heads: int,
                     interpret: bool = False) -> jax.Array:
    return _pallas_attention(qkv, num_heads, interpret)


def _fused_fwd(qkv, num_heads, interpret):
    return _pallas_attention(qkv, num_heads, interpret), qkv


def _fused_bwd(num_heads, interpret, qkv, g):
    _, vjp = jax.vjp(lambda t: xla_attention(t, num_heads), qkv)
    return vjp(g)


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


def tiny_attention(qkv: jax.Array, num_heads: int, *,
                   impl: str = "auto") -> jax.Array:
    """Multi-head self-attention on a raw (B, S, 3*D) qkv projection.

    impl: "auto" (Pallas on TPU, XLA elsewhere), "pallas", "interpret"
    (Pallas in interpreter mode — CPU-testable), or "xla".
    """
    d3 = qkv.shape[-1]
    if d3 % 3 or (d3 // 3) % num_heads:
        raise ValueError(f"qkv last dim {d3} not divisible into 3x{num_heads} heads")
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl in ("pallas", "interpret"):
        return _fused_attention(qkv, num_heads, impl == "interpret")
    return xla_attention(qkv, num_heads)
