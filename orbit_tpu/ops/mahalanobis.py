"""Fused Mahalanobis-distance logits as a Pallas TPU kernel.

The SimpleCNAPs head scores every query feature against every class
distribution: ``logits[m, c] = -(f_m - mu_c)^T P_c (f_m - mu_c)``
(reference: model/classifier_heads.py:328-347). The XLA einsum formulation
(orbit_tpu.models.heads.predict_mahalanobis) materialises the (M, C, D) diff
and half-product tensors in HBM — at M=256 queries, C=16 classes, D=1280
features that is ~42 MB of intermediate traffic per batch. This kernel blocks
over classes: per grid step the (M, D) diff, its (D, D) precision matmul
(MXU) and the row reduction all stay in VMEM, so HBM traffic is just the
inputs and the (C, M) output.

Output is (C, 8, M) — each (class, M-tile) grid cell owns one lane-aligned
block, written exactly once — sliced/transposed to (M, C) outside (free
fusion for XLA).

Falls back to the jnp einsum path on non-TPU backends (``interpret=True``
under tests).

MEASURED on v5e (2026-08-16, scripts/bench_mahalanobis.py, C=16, D=1280,
f32, min-of-3 two-point timing through the axon tunnel):

    M= 256   xla 0.13-0.20 ms   pallas 0.05-0.26 ms   (noise-dominated)
    M= 512   xla 0.16-0.26 ms   pallas 0.31-0.54 ms
    M=1024   xla ~0.37 ms       pallas 0.67-1.02 ms
    M=2048   xla 0.91-1.12 ms   pallas 1.27-1.44 ms
    max |xla - pallas| = 3.9e-3 on |logits| ~ 1e3 (both effectively f32)

XLA's batched-einsum formulation sustains ~100-145 TF/s (it fuses the diff
into the matmul operands and runs default-precision MXU passes); the Pallas
kernel reaches ~80-85 TF/s. The op is <5% of end-to-end CLU-VE predict time
(the backbone dominates), so the DEFAULT BACKEND IS XLA and the kernel is
an opt-in (``force="pallas"``) kept for the D-tiled accumulation pattern and
as a regression harness. Re-measure before flipping the default.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _kernel(mask_ref, feats_ref, means_ref, prec_ref, out_ref, half_ref, *,
            logit_scale):
    # grid: (C, M_tiles, D_tiles) — D innermost so the quadratic form
    # accumulates over row-tiles of the class's (D, D) precision. NB the
    # (i, k, 0) precision index map changes per (class, D-tile) AND resets
    # per M-tile, so precision is re-streamed M_tiles times per class —
    # reflected in the cost estimate below. Blocks: feats
    # (TILE_M, D), prec row-tile (1, TILE_D, D), half accumulator
    # (TILE_M, D) f32 scratch in VMEM, out (C, TILE_M), mask (C, 1) in SMEM.
    import jax.experimental.pallas as pl

    ci = pl.program_id(0)
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)
    tile_d = prec_ref.shape[1]

    @pl.when(ki == 0)
    def _():
        half_ref[:] = jnp.zeros_like(half_ref)

    k0 = pl.multiple_of(ki * tile_d, 128)  # lane-aligned column slice
    diff_k = (feats_ref[:, pl.ds(k0, tile_d)]
              - means_ref[ci, pl.ds(k0, tile_d)])               # (TILE_M, TILE_D)
    half_ref[:] += jnp.dot(diff_k, prec_ref[0],
                           preferred_element_type=jnp.float32)  # (TILE_M, D)

    @pl.when(ki == n_k - 1)
    def _():
        diff = feats_ref[:] - means_ref[ci, :]                  # (TILE_M, D)
        dist = jnp.sum(half_ref[:] * diff, axis=1)              # (TILE_M,)
        valid = mask_ref[ci, 0] > 0
        row = jnp.where(valid, -logit_scale * dist, NEG_INF)
        # out block is (1, 8, TILE_M) at (ci, 0, j): each grid cell owns its
        # own block, written exactly once — revisiting an output block across
        # non-consecutive grid steps is undefined in pallas (it produced
        # garbage at M_tiles >= 4). The sublane dim must be >= 8, so the row
        # is broadcast 8x and the caller slices [:, 0, :].
        out_ref[0, :, :] = jnp.broadcast_to(row, (8, row.shape[0]))


def _pallas_logits(features, means, precisions, class_mask, logit_scale,
                   interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from orbit_tpu.ops.vma import align_vma, out_struct

    m, d = features.shape
    c = means.shape[0]
    tile_m = m
    while tile_m > 256 and tile_m % 2 == 0:
        tile_m //= 2
    # D-tiling over the precision operand bounds VMEM: feats tile + half
    # accumulator + double-buffered (1, TILE_D, D) precision row-tile.
    # TILE_D must be lane-aligned (multiple of 128) or Mosaic rejects the
    # dynamic feats/means column slice.
    tile_d = d
    for cand in (256, 128):
        if d % cand == 0:
            tile_d = cand
            break
    grid = (c, m // tile_m, d // tile_d)
    mask_c, feats_f, means_f, prec_f = align_vma(
        class_mask.reshape(c, 1).astype(jnp.float32),
        features.astype(jnp.float32), means.astype(jnp.float32),
        precisions.astype(jnp.float32))
    out = pl.pallas_call(
        functools.partial(_kernel, logit_scale=logit_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # mask (C,1)
            pl.BlockSpec((tile_m, d), lambda i, j, k: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d), lambda i, j, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_d, d), lambda i, j, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, tile_m), lambda i, j, k: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((c, 8, m), jnp.float32, mask_c,
                             feats_f, means_f, prec_f),
        scratch_shapes=[pltpu.VMEM((tile_m, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * d * c + 3 * m * d * c,
            # feats re-read per class; precision re-streamed per M-tile
            bytes_accessed=(m * d * c + c * d
                            + (m // tile_m) * c * d * d + c * m) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(mask_c, feats_f, means_f, prec_f)
    return out[:, 0, :].T  # (M, C)


def mahalanobis_logits(features: jnp.ndarray, means: jnp.ndarray,
                       precisions: jnp.ndarray,
                       class_mask: Optional[jnp.ndarray] = None,
                       logit_scale: float = 1.0,
                       force: Optional[str] = None) -> jnp.ndarray:
    """(M, D) features vs (C, D)/(C, D, D) class stats -> (M, C) logits.

    ``force``: None = auto (Pallas on TPU, einsum elsewhere), "pallas",
    "interpret" (Pallas interpreter, for tests), or "xla".

    shard_map note: "pallas" traces and lowers cleanly inside shard_map
    (vma-typed via ops.vma; trace-pinned in tests/test_ops.py), but
    "interpret" does NOT execute inside shard_map — interpret mode replays
    the kernel as plain JAX ops, and the program_id-derived dynamic-slice
    column indices are vma-invariant against the dp-varying feature refs,
    which strict-vma type checking rejects. Use "interpret" only outside
    shard_map (or force="xla" inside it on CPU).
    """
    c = means.shape[0]
    if class_mask is None:
        class_mask = jnp.ones((c,), jnp.float32)

    # Default: XLA. Measured on v5e at the benchmark's shapes (M<=2048, C=16,
    # D=1280) the einsum formulation is ~1.3x faster than the Pallas kernel —
    # XLA already fuses the diff/half intermediates — so the kernel is an
    # opt-in (force="pallas") until it wins.
    backend = force or "xla"

    if backend in ("pallas", "interpret"):
        return _pallas_logits(features, means, precisions, class_mask,
                              logit_scale, interpret=(backend == "interpret"))

    f = features.astype(jnp.float32)
    diff = means.astype(jnp.float32)[None, :, :] - f[:, None, :]
    half = jnp.einsum("mcd,cde->mce", diff, precisions.astype(jnp.float32))
    logits = -jnp.einsum("mce,mce->mc", half, diff) * logit_scale
    return jnp.where(class_mask.astype(bool)[None, :], logits, NEG_INF)
