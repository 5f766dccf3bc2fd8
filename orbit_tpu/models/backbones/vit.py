"""Vision Transformers (ViT-S/32, ViT-B/32, ViT-B/32-CLIP) in Flax, NHWC.

Capability parity with the reference's timm ViTs
(reference: model/feature_extractors.py:49-64):
- ``vit_s_32``  = timm vit_small_patch32_224_in21k  (dim 384, depth 12, heads 6)
- ``vit_b_32``  = timm vit_base_patch32_224_in21k   (dim 768, depth 12, heads 12)
- ``vit_b_32_clip`` = timm vit_base_patch32_224_clip_laion2b (dim 768 + pre-norm)

Output is the class token after the final LayerNorm (timm ``num_classes=0``,
token pooling). FiLM adaptation (reference: model/film.py:57-66 tags every
LayerNorm named norm/norm1/norm2) is realised functionally: the FiLM spec
(`film_spec`) names each block's norm1/norm2 and the final norm scale/bias in
the Flax param tree, and the caller overrides those leaves before ``apply``
— the JAX equivalent of torch's ``functional_call`` with a film dict
(reference: model/few_shot_recognisers.py:115).

TPU notes: all heavy math is batched matmul (MXU-friendly); attention uses
the fused tiny-sequence kernel (orbit_tpu/ops/tiny_attention.py — Pallas on
TPU, ``jax.nn.dot_product_attention`` elsewhere); ``dtype`` selects the
compute precision (bfloat16 recommended) while params stay float32.
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class DenseParams(nn.Module):
    """Parameter-only holder with ``nn.Dense``'s exact {kernel, bias} tree
    and initialisers — the fused ops consume the params directly (the GEMMs
    run inside Pallas kernels), but checkpoints and the timm weight
    converter see an unchanged Dense layout."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_dim, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class LnParams(nn.Module):
    """Parameter-only holder matching ``nn.LayerNorm``'s {scale, bias} tree
    (FiLM tags these leaves — adapted values flow into the fused kernels)."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class MlpParams(nn.Module):
    """fc1/fc2 param holders under the ``mlp`` scope (Dense-layout tree)."""

    in_dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = DenseParams(self.in_dim, self.hidden, name="fc1")()
        w2, b2 = DenseParams(self.hidden, self.in_dim, name="fc2")()
        return w1, b1, w2, b2


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"  # fused Pallas on TPU, XLA elsewhere

    @nn.compact
    def __call__(self, x):
        from orbit_tpu.ops.tiny_attention import fused_qkv_attention

        # S=50-token attention is HBM-bound under XLA (head transposes +
        # materialised scores round-trip HBM every layer); the fused op runs
        # qkv projection -> blocked scores -> softmax -> AV in one Pallas
        # kernel so the (B,S,3D) qkv tensor never touches HBM
        # (orbit_tpu/ops/tiny_attention.py; measured numbers in PERF.md)
        kernel, bias = DenseParams(self.dim, 3 * self.dim, name="qkv")()
        out = fused_qkv_attention(x.astype(self.dtype), kernel, bias,
                                  self.num_heads, impl=self.attn_impl)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class EncoderBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    ln_eps: float
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        from orbit_tpu.ops.mlp_block import fused_mlp_block

        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.dim, self.num_heads, dtype=self.dtype,
                          attn_impl=self.attn_impl, name="attn")(h)
        # the MLP half-block (norm2 -> fc1 -> gelu -> fc2 -> +x) runs as one
        # Pallas kernel on TPU: the (B,S,4D) hidden tensor never touches HBM
        # (orbit_tpu/ops/mlp_block.py; measured numbers in PERF.md)
        ln_scale, ln_bias = LnParams(self.dim, name="norm2")()
        w1, b1, w2, b2 = MlpParams(self.dim, int(self.dim * self.mlp_ratio),
                                   name="mlp")()
        return fused_mlp_block(x.astype(self.dtype), ln_scale, ln_bias,
                               w1, b1, w2, b2, ln_eps=self.ln_eps,
                               impl=self.attn_impl)


class ViT(nn.Module):
    """Patch-embedding ViT with class-token pooling (timm-compatible layout)."""

    patch_size: int = 32
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    pre_norm: bool = False       # CLIP-style ln_pre after patch embed
    ln_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"      # "auto" | "pallas" | "xla" (ops.tiny_attention)

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        # x: (N, H, W, 3) normalised frames; mask accepted for API parity
        # with the BN backbones (LayerNorm is per-row — padding-immune)
        del mask
        n = x.shape[0]
        x = nn.Conv(
            self.dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID", dtype=self.dtype, name="patch_embed",
        )(x)
        x = x.reshape(n, -1, self.dim)  # (N, num_patches, D)
        num_patches = x.shape[1]

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, num_patches + 1, self.dim),
        )
        x = jnp.concatenate([jnp.tile(cls.astype(x.dtype), (n, 1, 1)), x], axis=1)
        x = x + pos.astype(x.dtype)

        if self.pre_norm:
            x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm_pre")(x)

        for i in range(self.depth):
            x = EncoderBlock(
                self.dim, self.num_heads, self.mlp_ratio, self.ln_eps,
                dtype=self.dtype, attn_impl=self.attn_impl, name=f"blocks_{i}",
            )(x)

        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm")(x)
        return x[:, 0].astype(jnp.float32)  # class token, (N, D)


def vit_film_spec(depth: int, dim: int) -> List[Tuple[Tuple[str, ...], int]]:
    """FiLM-able LayerNorm scale/bias leaves, in sorted-name order.

    Mirrors the reference's tagging of LayerNorms named norm/norm1/norm2
    (reference: model/film.py:57-66); ``norm_pre`` (CLIP) is deliberately NOT
    tagged, matching the reference's name filter.
    """
    spec: List[Tuple[Tuple[str, ...], int]] = []
    for i in range(depth):
        for ln in ("norm1", "norm2"):
            spec.append(((f"blocks_{i}", ln, "scale"), dim))
            spec.append(((f"blocks_{i}", ln, "bias"), dim))
    spec.append((("norm", "scale"), dim))
    spec.append((("norm", "bias"), dim))
    return spec


def create_vit(name: str, dtype: Dtype = jnp.float32):
    """Factory: name -> (module, output_size, film_spec)."""
    if name == "vit_s_32":
        m = ViT(patch_size=32, dim=384, depth=12, num_heads=6, ln_eps=1e-6, dtype=dtype)
        return m, 384, vit_film_spec(12, 384)
    if name == "vit_b_32":
        m = ViT(patch_size=32, dim=768, depth=12, num_heads=12, ln_eps=1e-6, dtype=dtype)
        return m, 768, vit_film_spec(12, 768)
    if name == "vit_b_32_clip":
        m = ViT(patch_size=32, dim=768, depth=12, num_heads=12, pre_norm=True, ln_eps=1e-5, dtype=dtype)
        return m, 768, vit_film_spec(12, 768)
    raise ValueError(f"Unknown ViT variant: {name}")
