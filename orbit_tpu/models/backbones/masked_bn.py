"""BatchNorm with row-masked batch statistics for fixed-shape padded episodes.

Fixed-shape episodes (orbit_tpu.data.episodes) carry zero-padded rows; during
meta-training with ``learn_extractor`` the extractor's BatchNorm runs on batch
statistics (reference: _set_batch_norm_state,
model/few_shot_recognisers.py:176-183), and unmasked statistics would be
biased toward zero on sparsely-filled buckets. ``MaskedBatchNorm`` computes
the batch mean/variance as *weighted* moments over the row (frame) mask, so a
20-real-row episode padded to a 256 bucket yields exactly the statistics of
an unpadded 20-row batch (tests/test_masked_bn.py).

Variable structure is identical to ``flax.linen.BatchNorm`` (params
``scale``/``bias``; batch_stats ``mean``/``var``), so checkpoints and the
torch weight converter are unaffected.

Running-stat updates follow torch semantics (the reference's timm backbones):
the running variance blends the UNBIASED batch variance while normalisation
uses the biased one, and a chunk with zero valid rows (an all-padding scan
chunk) leaves the running stats untouched.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """Drop-in BatchNorm over the last axis with an optional per-row weight.

    ``mask`` is a float (N,) validity mask over the leading (batch) axis; all
    other axes are reduced as usual. ``mask=None`` or eval mode reproduce
    ``nn.BatchNorm`` exactly (up to the torch-style unbiased running-var
    update).
    """

    momentum: float = 0.9
    epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool,
                 mask: Optional[jnp.ndarray] = None, fold: bool = False):
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)

        if fold:
            # return the eval affine (a, b) WITHOUT applying it, for callers
            # that fuse it into an adjacent op (ops/depthwise.fused_dw_act);
            # registers the identical param/variable tree as the apply path
            if not use_running_average:
                raise ValueError("fold=True requires running statistics")
            a = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            return a, bias - ra_mean.value * a

        if use_running_average:
            # Eval path: fold to a per-channel affine computed in f32 and
            # applied in compute dtype. Mathematically identical to
            # (x - mean) * rsqrt(var + eps) * scale + bias, but the tensor
            # never round-trips through float32 — on a bf16 backbone the
            # f32 upcast between every conv doubled HBM traffic and broke
            # XLA's conv-epilogue fusion (measured on EfficientNet-B0's
            # eval forward: scripts/bench_effnet_variants.py / PERF.md).
            a = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            b = bias - ra_mean.value * a
            return x * a.astype(self.dtype) + b.astype(self.dtype)
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            # elements per row = product of the spatial axes
            row_elems = float(np_prod(x.shape[1:-1]))
            # variance is computed two-pass (E[(x-mean)^2], not E[x^2]-E[x]^2):
            # the one-pass form cancels catastrophically for poorly-centered
            # high-magnitude activations even in float32 (advisor finding,
            # round 2); one extra reduction, train path only
            if mask is None:
                count = jnp.float32(x.shape[0] * row_elems)
                mean = xf.mean(axis=reduce_axes)
                centered = xf - mean
                var = (centered * centered).mean(axis=reduce_axes)
            else:
                w = mask.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
                valid = w > 0
                count = w.sum() * row_elems
                safe = jnp.maximum(count, 1.0)
                # select-then-sum (not multiply-by-w): a padded row that has
                # already overflowed to inf upstream would turn w*inf into
                # NaN and poison the statistics of the REAL rows
                mean = jnp.where(valid, xf, 0.0).sum(axis=reduce_axes) / safe
                centered = jnp.where(valid, xf - mean, 0.0)
                var = (centered * centered).sum(axis=reduce_axes) / safe
                # an all-padding batch (count == 0) must normalise with the
                # RUNNING stats, not the degenerate mean=0/var=0 — otherwise
                # every layer amplifies activations by ~1/sqrt(eps) and a
                # deep net overflows (NaN gradients even under a zero-weight
                # loss, since 0 * inf = nan)
                has_rows = count > 0
                mean = jnp.where(has_rows, mean, ra_mean.value)
                var = jnp.where(has_rows, var, ra_var.value)
            if not self.is_initializing():
                # torch-style update: unbiased variance into the running stat
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                new_mean = self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                new_var = self.momentum * ra_var.value + (1.0 - self.momentum) * unbiased
                has_rows = count > 0
                ra_mean.value = jnp.where(has_rows, new_mean, ra_mean.value)
                ra_var.value = jnp.where(has_rows, new_var, ra_var.value)

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        if not use_running_average and mask is not None:
            # Padded rows are normalised with the REAL rows' statistics; when
            # a 1x1-spatial chunk has a single real row its batch var is
            # exactly 0 and rsqrt(eps) amplifies the garbage pad rows ~32x
            # PER LAYER — a 32px EfficientNet overflows them to inf within
            # one stage, and inf anywhere (masked one-hot matmuls, masked CE)
            # becomes 0*inf = NaN. Pad rows are dead by the design invariant
            # (every consumer is mask-aware), so pin them to zero.
            w = mask.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
            y = jnp.where(w > 0, y, 0.0)
        return y.astype(self.dtype)


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out
