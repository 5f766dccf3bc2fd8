"""Eval-time parameter precision: store extractor weights in bfloat16.

Under ``--compute_dtype bfloat16`` every Dense/Conv/LayerNorm in the
backbones casts its float32 params to bfloat16 at each use (flax ``dtype``
semantics), so the compiled program re-reads the full float32 weight tensors
from HBM and materialises a bfloat16 copy on every dispatch.  Pre-casting
the stored extractor params to bfloat16 once produces bit-identical
compute (the cast is idempotent) while halving weight-streaming bytes and
deleting the per-dispatch cast — this matters for the small per-video /
per-context dispatches of the CLU-VE eval protocol, where weight streaming
is not amortised over a large batch.

MaskedBatchNorm scale/bias are EXCLUDED: BN affine math runs in float32
regardless of compute dtype (masked_bn.py applies ``y * scale + bias``
before the output cast), so casting those leaves would change numerics.

The reference has no analog (torch modules hold a single param dtype);
this is the TPU-native replacement for its implicit fp32 eval
(reference: model/few_shot_recognisers.py — all-fp32 everywhere).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def _is_bn_path(path) -> bool:
    return any(getattr(k, "key", str(k)).startswith("bn") for k in path)


def cast_extractor_params(variables: Dict[str, Any],
                          dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Return ``variables`` with extractor params cast to ``dtype``.

    Only ``params/extractor`` leaves are touched (heads and FiLM generators
    compute in float32 by design invariant); BatchNorm scale/bias stay
    float32 (see module docstring).  batch_stats are untouched.
    """
    if "params" not in variables or "extractor" not in variables["params"]:
        return variables

    def cast(path, leaf):
        if _is_bn_path(path):
            return leaf
        return leaf.astype(dtype) if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf

    extractor = jax.tree_util.tree_map_with_path(
        cast, variables["params"]["extractor"])
    params = {**variables["params"], "extractor": extractor}
    return {**variables, "params": params}
