"""Backbone registry (reference equivalent: model/feature_extractors.py:37-79).

``create_feature_extractor(name)`` returns ``(module, output_size, film_spec)``
where ``film_spec`` is a list of ``(param_path, size)`` naming the FiLM-able
norm scale/bias leaves in the Flax param tree (empty use => no FiLM).

Pretrained weights: the reference downloads pinned timm/CLIP checkpoints at
construction; in this framework weights are converted offline with
``orbit_tpu.models.convert`` and loaded from an orbax/msgpack checkpoint.
"""
from __future__ import annotations

import jax.numpy as jnp

from orbit_tpu.models.backbones.efficientnet import create_efficientnet
from orbit_tpu.models.backbones.vit import create_vit

FEATURE_EXTRACTORS = (
    "efficientnet_b0", "efficientnet_v2_s", "vit_s_32", "vit_b_32", "vit_b_32_clip",
)


def create_feature_extractor(name: str, dtype=jnp.float32):
    if name.startswith("efficientnet"):
        return create_efficientnet(name, dtype=dtype)
    if name.startswith("vit"):
        return create_vit(name, dtype=dtype)
    raise ValueError(f"Invalid feature_extractor name: {name} (choices: {FEATURE_EXTRACTORS})")
