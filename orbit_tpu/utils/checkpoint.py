"""Checkpoint save/restore (flax msgpack files).

Reference equivalent: torch.save/load of ``checkpoint.pt`` (epoch, model,
optimizer, best stats), ``best.pt`` and ``final.pt``
(reference: single-step-learner.py:377-390,185,291-293). Here a checkpoint is
a single msgpack file holding the full JAX pytree; the restore path takes a
template tree with the same structure (the freshly-initialised state), which
also validates shape/dtype compatibility for free.

The reference's ``load_checkpoint`` resume helper exists but is never wired
in (SURVEY.md §5); here resume is a first-class path
(``single-step-learner.py --resume_from``).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, tree: Dict[str, Any]) -> None:
    """Serialise ``tree`` (any JAX/NumPy pytree) to ``path`` atomically."""
    tree = jax.tree_util.tree_map(np.asarray, tree)
    data = serialization.to_bytes(tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``template`` supplies the tree structure (and array dtypes/shapes); a
    freshly-initialised train state is the natural template.
    """
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def maybe_load_params(path: Optional[str], template_variables, logfile=None):
    """Load model variables from ``path`` if it exists, else warn and return
    the pretrained/initial variables (reference behaviour:
    single-step-learner.py:300-305)."""
    from orbit_tpu.utils.logging import print_and_log

    if path and os.path.exists(path):
        restored = load_checkpoint(path, template_variables)
        return restored, path
    print_and_log(logfile, "warning: saved model path could not be found; "
                           "using original param initialisation.")
    return template_variables, None
