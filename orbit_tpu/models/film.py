"""FiLM adaptation as pure pytree surgery.

The reference adapts its backbone by generating replacement values for tagged
BatchNorm/LayerNorm weight+bias tensors and running the network via
``torch.nn.utils.stateless.functional_call`` with those overrides
(reference: model/few_shot_recognisers.py:115, model/feature_adapters.py:66-78,
model/film.py:38-94). JAX params are already an explicit tree, so FiLM here is:

1. ``film_spec`` — list of ``(param_path, size)`` produced by the backbone
   factory, naming every FiLM-able norm ``scale``/``bias`` leaf.
2. ``FilmParameterGenerator`` — one DenseBlock(64, 64, size) generator and a
   learnable regulariser per leaf; scale leaves get ``init * (gen(e)·reg + 1)``,
   bias leaves get ``init + gen(e)·reg`` (reference: feature_adapters.py:66-78,
   including its quirk of multiplying the *initial* detached copy, not the
   live parameter).
3. ``apply_film`` — non-destructively override those leaves in the backbone
   param tree; then call ``module.apply`` as usual. Fully jittable: the paths
   are static, the values are traced.

The generator also returns the L2 term over its regularisers, which the
training loss adds with weight 1e-3 (reference: single-step-learner.py:204,233).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from orbit_tpu.models.mlps import DenseBlock

FilmSpec = Sequence[Tuple[Tuple[str, ...], int]]
FilmValues = Dict[Tuple[str, ...], jnp.ndarray]


def spec_names(film_spec: FilmSpec) -> List[str]:
    """Stable dotted names for each leaf, sorted (the reference sorts its
    film parameter names, feature_adapters.py:43-44)."""
    return sorted(".".join(path) for path, _ in film_spec)


def get_initial_film_values(params, film_spec: FilmSpec) -> FilmValues:
    """Detached initial copies of the FiLM leaves (reference: film.py:81-87)."""
    out: FilmValues = {}
    for path, _ in film_spec:
        leaf = params
        for key in path:
            leaf = leaf[key]
        out[path] = leaf
    return out


def apply_film(params, film_values: Optional[FilmValues]):
    """Return a param tree with the FiLM leaves replaced (non-destructive)."""
    if not film_values:
        return params

    def override(tree, path, value, depth=0):
        key = path[depth]
        new = dict(tree)
        if depth == len(path) - 1:
            new[key] = value.astype(tree[key].dtype)
        else:
            new[key] = override(tree[key], path, value, depth + 1)
        return new

    for path, value in film_values.items():
        params = override(params, path, value)
    return params


class FilmParameterGenerator(nn.Module):
    """Generates per-task FiLM leaf values from a 64-d task embedding.

    One DenseBlock + regulariser per leaf (reference:
    model/feature_adapters.py:36-78). ``__call__`` returns
    ``(film_values, l2_term)`` where l2_term = sum of squared regularisers.
    """

    film_spec: Tuple[Tuple[Tuple[str, ...], int], ...]
    hidden_size: int = 64

    @nn.compact
    def __call__(self, task_embedding):
        # Deterministic ordering by dotted name, mirroring the reference sort.
        ordered = sorted(self.film_spec, key=lambda e: ".".join(e[0]))
        film_values: FilmValues = {}
        l2_term = 0.0
        for path, size in ordered:
            dotted = ".".join(path)
            gen = DenseBlock(self.hidden_size, size, name=f"gen__{dotted.replace('.', '_')}")
            reg = self.param(
                f"reg__{dotted.replace('.', '_')}",
                nn.initializers.normal(stddev=0.001),
                (size,),
            )
            g = gen(task_embedding).reshape(size)
            leaf_kind = path[-1]
            if leaf_kind == "scale":      # torch 'weight': multiplicative
                film_values[path] = g * reg + 1.0
            elif leaf_kind == "bias":     # additive
                film_values[path] = g * reg
            else:
                raise ValueError(f"FiLM leaf must be scale/bias, got {dotted}")
            l2_term = l2_term + (reg ** 2).sum()
        return film_values, l2_term


def film_values_from_initial(initial: FilmValues, generated: FilmValues) -> FilmValues:
    """Combine generated multipliers/offsets with the initial leaf values:
    scale leaves multiply, bias leaves add (reference: feature_adapters.py:71-75).
    """
    out: FilmValues = {}
    for path, gen_val in generated.items():
        if path[-1] == "scale":
            out[path] = initial[path] * gen_val
        else:
            out[path] = initial[path] + gen_val
    return out
