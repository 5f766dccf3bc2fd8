"""DeepSets task/set encoder (reference: model/set_encoders.py:34-134).

Encodes each context frame to a 64-d embedding with a 5-layer conv net, then
mean-pools over the set to form the task embedding that conditions the FiLM
generator.

BatchNorm note: the reference keeps this encoder in eval() mode at all times
(few_shot_recognisers.py:176-183 sets the whole model eval and only flips the
feature extractor to train), so its BN running stats remain at their (0, 1)
init forever and BN degenerates to a learnable affine. We replicate that with
a plain scale/bias affine — bit-identical maths (up to eps) with fewer
moving parts.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

SET_ENCODER_OUTPUT_SIZE = 64
_BN_EPS = 1e-5


class _AffineNorm(nn.Module):
    """BatchNorm permanently in eval mode with frozen (0,1) stats:
    y = x * scale / sqrt(1 + eps) + bias."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * (scale / jnp.sqrt(1.0 + _BN_EPS)) + bias


class SetEncoder(nn.Module):
    """5x [conv3x3-64, norm, ReLU, maxpool2] -> global avg pool -> 64-d."""

    @nn.compact
    def __call__(self, x):
        # x: (N, H, W, 3) individual frames (clips pre-flattened by caller)
        for i in range(5):
            x = nn.Conv(64, (3, 3), strides=1, padding="SAME", name=f"conv{i + 1}")(x)
            x = _AffineNorm(64, name=f"norm{i + 1}")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.mean(axis=(1, 2))  # adaptive avg pool to 1x1
        return x  # (N, 64)


def aggregate(reps: jnp.ndarray, aggregation: str = "mean") -> jnp.ndarray:
    """Aggregate per-element encodings (reference: set_encoders.py:61-75)."""
    if aggregation == "mean":
        return reps.mean(axis=0, keepdims=True)
    if aggregation == "none":
        return reps
    raise ValueError(f"Aggregation method {aggregation} not valid!")


def aggregate_masked(reps: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over the set axis for fixed-shape padded episodes."""
    mask = mask.reshape(-1, 1).astype(reps.dtype)
    total = jnp.maximum(mask.sum(), 1.0)
    return (reps * mask).sum(axis=0, keepdims=True) / total
