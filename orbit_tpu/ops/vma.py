"""shard_map varying-mesh-axes (vma) utilities shared by the Pallas ops.

JAX 0.9's shard_map tracks which mesh axes every value varies over
("vma") and type-checks primitives strictly. Three consequences for a
custom Pallas op used inside episode-DP / query-sharding shard_maps:

1. ``pallas_call`` outputs must DECLARE their varying axes
   (``out_struct``) — a plain ShapeDtypeStruct has ``vma=None`` and the
   call fails to trace.
2. Kernel bodies type-check too: a dot_general between a varying
   activation block and a replicated weight block is rejected, so every
   operand must enter the call vma-aligned (``align_vma``).
3. An opaque ``custom_vjp`` backward IS the AD transpose: shard_map's
   automatic psum on replicated-input cotangents only fires when JAX
   transposes its own pbroadcast, which never happens inside a custom
   bwd — the bwd must psum partial per-shard dW/db itself
   (``match_cotangent_vma``), or the replicated (P()) grad out_specs
   fail to type-check. The psum is exactly-correct, not doubled (the
   CLAUDE.md "never psum grads" rule is about code OUTSIDE custom_vjp,
   where the automatic transpose does fire).

All three are no-ops outside shard_map (every vma set is empty).
"""
from __future__ import annotations

import jax


def _vma(x) -> frozenset:
    return getattr(jax.typeof(x), "vma", frozenset())


def out_struct(shape, dtype, *operands):
    """ShapeDtypeStruct whose varying-mesh-axes set is the union of the
    operands' — for pallas_call out_shapes traced inside shard_map."""
    vma = frozenset()
    for o in operands:
        vma = vma | _vma(o)
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def align_vma(*arrays):
    """pcast every array to the union of the group's varying axes so a
    Pallas kernel body sees uniformly-typed operands."""
    target = frozenset()
    for a in arrays:
        target = target | _vma(a)
    out = []
    for a in arrays:
        extra = target - _vma(a)
        out.append(jax.lax.pcast(a, tuple(sorted(extra)), to="varying")
                   if extra else a)
    return out


def match_cotangent_vma(ct, primal):
    """psum a custom_vjp cotangent over any mesh axes it varies on but
    its primal does not (replicated params under episode-DP)."""
    extra = _vma(ct) - _vma(primal)
    return jax.lax.psum(ct, tuple(sorted(extra))) if extra else ct
