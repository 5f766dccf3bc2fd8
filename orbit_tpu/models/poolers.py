"""Frame-to-clip feature pooling (reference: model/poolers.py:7-24)."""
from __future__ import annotations

import jax.numpy as jnp


def mean_pool_clips(frame_features: jnp.ndarray, clip_length: int) -> jnp.ndarray:
    """(num_clips*T, D) -> (num_clips, D) by averaging each clip's T frames."""
    feat_dim = frame_features.shape[-1]
    return frame_features.reshape(-1, clip_length, feat_dim).mean(axis=1)


def identity_pool(frame_features: jnp.ndarray) -> jnp.ndarray:
    return frame_features
