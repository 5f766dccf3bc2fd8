"""Fused transformer MLP half-block for TPU (Pallas).

Computes ``y = x + fc2(gelu(fc1(LayerNorm(x))))`` in one kernel. Under XLA
the (B, S, 4D) hidden tensor materialises in HBM between the two GEMMs
(~314 MB of traffic per ViT-B/32 encoder layer at batch 512) and the
LayerNorm output round-trips as well; fusing the whole half-block keeps
everything in VMEM. Measured e2e on ViT-B/32 @512 (v5e), stacked on the
fused attention kernel: 44.8 -> 38.8 ms/it (99.8 -> 115.2 TF/s, 58.5% MFU;
PERF.md). Both weight matrices ride VMEM-resident across grid cells
(constant index_map, ~9.4 MB for ViT-B).

GELU is the exact (erf) form the timm ViTs use (reference:
model/feature_extractors.py:49-64 -> timm vit_* with act_layer=GELU);
Mosaic has no erf primitive, so the kernel evaluates the Abramowitz &
Stegun 7.1.26 polynomial (measured max abs err ~2e-6 in f32 — ~1000x below
bf16 resolution; parity-tested against jax.nn.gelu(approximate=False)).

Gradients: ``jax.custom_vjp``. On TPU the backward is a second Pallas
kernel (``_mlp_bwd_kernel``) that recomputes LN/fc1/gelu in VMEM and emits
dx per batch block plus all six parameter grads via resident f32 VMEM
accumulators (constant index_map outputs revisited on every consecutive
grid step), so the (B,S,4D) hidden tensor stays out of HBM in training too.
``tiny_attention._PALLAS_BWD = False`` falls back to differentiating the
XLA reference recompute. FiLM note: norm2's scale/bias are FiLM-tagged
leaves — they arrive here as values, so task-adapted films flow through the
kernel unchanged and receive gradients (dgamma/dbeta) from the backward.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orbit_tpu.ops.vma import (align_vma, match_cotangent_vma,
                               out_struct)

_BLOCK_B = 8

# sweep harness knob (scripts/bench_vit_s32_sweep.py): a non-None value
# forces the forward block rows regardless of model width
_BLOCK_B_OVERRIDE = None


def _fwd_block_rows(d: int) -> int:
    """Forward batch-block rows (real-v5e sweep, PERF.md "ViT-S/32
    block-geometry sweep"): 8 rows everywhere. At D=384 a single sweep
    reading suggested 16 rows won +6.4%, but a 3-rep alternating A/B read
    8 vs 16 at parity within the tunnel's ~2% run-to-run noise — so the
    uniform 8 stands. 32 rows exceeds the forward VMEM budget on the
    attention side, and 16-row ATTENTION blocks measurably lose 13%
    (block-diagonal score redundancy doubles)."""
    if _BLOCK_B_OVERRIDE is not None:
        return _BLOCK_B_OVERRIDE
    return _BLOCK_B

# The backward kernel's resident f32 dW accumulators (d x 4d + 4d x d =
# ~18.9 MB for ViT-B) plus VMEM-resident bf16 weights exceed Mosaic's
# default 16 MB scoped-vmem budget — measured on a real v5e: 27.18 MB
# requested ("Ran out of memory in memory space vmem ... allocating on
# stack"). v5e VMEM is 128 MB; raise the per-kernel cap for the backward
# calls only (forward kernels fit the default and keep XLA's usual
# double-buffering headroom).
_BWD_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def _erf_poly(x):
    # Abramowitz & Stegun 7.1.26 (f32), |err| <= 1.5e-7
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _ln_fc1_gelu(x, gam_row, bet_row, w1, b1_row, ln_eps):
    """LayerNorm -> fc1 -> exact-erf gelu, shared by the forward and
    backward kernels so their recomputed math can never drift apart.
    Returns every intermediate the backward needs; the forward's unused
    ones are dead-code-eliminated."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + ln_eps)
    xhat = xc * rstd
    xn = (xhat * gam_row + bet_row).astype(x.dtype)
    hpre = (jax.lax.dot_general(
        xn, w1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_row)
    erf = _erf_poly(hpre * (1.0 / math.sqrt(2.0)))
    hg = (0.5 * hpre * (1.0 + erf)).astype(x.dtype)
    return xf, xhat, rstd, xn, hpre, erf, hg


def _mlp_kernel(ln_eps, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref):
    nb, s, d = x_ref.shape
    gs = nb * s
    x = x_ref[...].reshape(gs, d)
    xf, _, _, _, _, _, hg = _ln_fc1_gelu(
        x, g_ref[0][None, :], b_ref[0][None, :], w1_ref[...],
        b1_ref[0][None, :], ln_eps)
    y = (jax.lax.dot_general(
        hg, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0][None, :] + xf)
    out_ref[...] = y.reshape(nb, s, d).astype(out_ref.dtype)


def _pallas_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps,
                interpret=False):
    n, s, d = x.shape
    nb = min(_fwd_block_rows(d), n)
    pad = (-n) % nb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))

    def row8(t, dt):
        # Mosaic wants block sublane dims >= 8: ship vectors as 8-row bcasts
        return jnp.broadcast_to(t.astype(dt)[None, :], (8, t.shape[0]))

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, ln_eps),
        out_shape=out_struct((n + pad, s, d), x.dtype, x, ln_scale,
                             ln_bias, w1, b1, w2, b2),
        grid=((n + pad) // nb,),
        in_specs=[
            pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((8, d)), const((8, d)),
            const(w1.shape), const((8, w1.shape[1])),
            const(w2.shape), const((8, d)),
        ],
        out_specs=pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*align_vma(x, row8(ln_scale, jnp.float32), row8(ln_bias, jnp.float32),
                 w1.astype(x.dtype), row8(b1, jnp.float32),
                 w2.astype(x.dtype), row8(b2, jnp.float32)))
    return out[:n] if pad else out


def xla_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps):
    """XLA reference: identical math (f32 LN/bias/residual, exact-erf gelu,
    dtype-precision GEMMs). Backward path and non-TPU forward."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + ln_eps)
          * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
          ).astype(x.dtype)
    h = (jnp.dot(xn, w1.astype(x.dtype)).astype(jnp.float32)
         + b1.astype(jnp.float32))
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    y = (jnp.dot(h, w2.astype(x.dtype)).astype(jnp.float32)
         + b2.astype(jnp.float32) + xf)
    return y.astype(x.dtype)


_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _mlp_bwd_kernel(ln_eps, x_ref, g_ref, gam_ref, bet_ref, w1_ref, b1_ref,
                    w2_ref, dx_ref, dgam_ref, dbet_ref, dw1_ref, db1_ref,
                    dw2_ref, db2_ref):
    """Backward of the fused half-block. Recomputes LN -> fc1 -> gelu for
    this batch block in VMEM; parameter grads accumulate in resident f32
    blocks (constant index_map, zeroed on grid step 0). fc2's bias grad is
    just colsum(g) so w2's bias never rides in."""
    nb, s, d = x_ref.shape
    gs = nb * s
    gam = gam_ref[0][None, :]
    xf, xhat, rstd, xn, hpre, erf, hg = _ln_fc1_gelu(
        x_ref[...].reshape(gs, d), gam, bet_ref[0][None, :], w1_ref[...],
        b1_ref[0][None, :], ln_eps)

    gf = g_ref[...].reshape(gs, d).astype(jnp.float32)
    gb = gf.astype(x_ref.dtype)
    # fc2: y = hg @ w2 + b2 (+ residual)
    dhg = jax.lax.dot_general(gb, w2_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(hg, gb, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # colsums stay 2D ((1, n) keepdims): Mosaic's hardware lowering is
    # pickier about 1D vectors than interpret mode (tiny_attention notes)
    db2 = jnp.sum(gf, axis=0, keepdims=True)
    # gelu'(h) = Phi(h) + h * phi(h)
    phi = jnp.exp(-0.5 * hpre * hpre) * _INV_SQRT_2PI
    dhpre = dhg * (0.5 * (1.0 + erf) + hpre * phi)
    db1 = jnp.sum(dhpre, axis=0, keepdims=True)
    dhb = dhpre.astype(x_ref.dtype)
    dxn = jax.lax.dot_general(dhb, w1_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw1 = jax.lax.dot_general(xn, dhb, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dgam = jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dbet = jnp.sum(dxn, axis=0, keepdims=True)
    # LayerNorm backward (per row)
    dxhat = dxn * gam
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2) + gf  # + residual branch
    dx_ref[...] = dx.reshape(nb, s, d).astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dgam_ref, dbet_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            ref[...] = jnp.zeros_like(ref)

    dw1_ref[...] += dw1
    dw2_ref[...] += dw2
    dgam_ref[...] += jnp.broadcast_to(dgam, dgam_ref.shape)
    dbet_ref[...] += jnp.broadcast_to(dbet, dbet_ref.shape)
    db1_ref[...] += jnp.broadcast_to(db1, db1_ref.shape)
    db2_ref[...] += jnp.broadcast_to(db2, db2_ref.shape)


def _pallas_mlp_bwd(x, ln_scale, ln_bias, w1, b1, w2, g, ln_eps,
                    interpret=False):
    n, s, d = x.shape
    h4 = w1.shape[1]
    nb = min(_BLOCK_B, n)
    pad = (-n) % nb
    def _os(shape, dtype):
        return out_struct(shape, dtype, x, g, ln_scale, ln_bias, w1, b1, w2)
    if pad:
        # zero-padded rows: LN of a zero row is beta (nonzero), but the g
        # rows are zero so dx/d-param contributions are exactly zero except
        # via colsums of dxn — and dxn = f(dhg) = f(g-row) = 0 as well.
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0)))

    def row8(t, dt):
        return jnp.broadcast_to(t.astype(dt)[None, :], (8, t.shape[0]))

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    blk = lambda: pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    f32 = jnp.float32
    dx, dgam8, dbet8, dw1, db18, dw2, db28 = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, ln_eps),
        out_shape=(
            _os((n + pad, s, d), x.dtype),
            _os((8, d), f32), _os((8, d), f32),
            _os((d, h4), f32), _os((8, h4), f32),
            _os((h4, d), f32), _os((8, d), f32),
        ),
        grid=((n + pad) // nb,),
        in_specs=[
            blk(), blk(),
            const((8, d)), const((8, d)),
            const(w1.shape), const((8, h4)),
            const(w2.shape),
        ],
        out_specs=(
            blk(),
            const((8, d)), const((8, d)),
            const(w1.shape), const((8, h4)),
            const(w2.shape), const((8, d)),
        ),
        compiler_params=_BWD_COMPILER_PARAMS,
        interpret=interpret,
    )(*align_vma(x, g, row8(ln_scale, f32), row8(ln_bias, f32),
                 w1.astype(x.dtype), row8(b1, f32), w2.astype(x.dtype)))
    if pad:
        dx = dx[:n]
    return (dx, dgam8[0].astype(ln_scale.dtype), dbet8[0].astype(ln_bias.dtype),
            dw1.astype(w1.dtype), db18[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db28[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps,
               interpret=False):
    return _pallas_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps,
                       interpret)


def _fused_mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps, interpret):
    return (_pallas_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps,
                        interpret),
            (x, ln_scale, ln_bias, w1, b1, w2, b2))


def _fused_mlp_bwd(ln_eps, interpret, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    from orbit_tpu.ops import tiny_attention as _ta
    if _ta._PALLAS_BWD:
        dx, dgam, dbet, dw1, db1, dw2, db2 = _pallas_mlp_bwd(
            x, ln_scale, ln_bias, w1, b1, w2, g, ln_eps, interpret)
        cts = (dx, dgam, dbet, dw1, db1, dw2, db2.astype(b2.dtype))
    else:
        # the escape hatch must stay usable under shard_map too: its inner
        # vjp sees already-varying residuals, so the replicated-param psum
        # never fires inside it (match_cotangent_vma below is a no-op when
        # it did)
        _, vjp = jax.vjp(
            lambda *a: xla_mlp_block(*a, ln_eps), x, ln_scale, ln_bias,
            w1, b1, w2, b2)
        cts = vjp(g)
    primals = (x, ln_scale, ln_bias, w1, b1, w2, b2)
    return tuple(match_cotangent_vma(c, p) for c, p in zip(cts, primals))


_fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def fused_mlp_block(x: jax.Array, ln_scale, ln_bias, w1, b1, w2, b2, *,
                    ln_eps: float = 1e-6, impl: str = "auto") -> jax.Array:
    """``x + fc2(gelu(fc1(LayerNorm(x))))`` in one op.

    x: (B, S, D); ln_scale/ln_bias: (D,); w1: (D, hidden); w2: (hidden, D).
    impl: "auto" (fused Pallas on TPU, XLA elsewhere), "fused", "interpret"
    (CPU-testable), or "xla".
    """
    d = x.shape[-1]
    if w1.shape[0] != d or w2.shape[1] != d or w1.shape[1] != w2.shape[0]:
        raise ValueError(f"mlp weight shapes {w1.shape}/{w2.shape} do not "
                         f"chain with token dim {d}")
    from orbit_tpu.ops import tiny_attention as _ta
    if _ta._IMPL_OVERRIDE is not None:  # MACs analysis forces "xla"
        impl = _ta._IMPL_OVERRIDE
    if impl == "auto":
        impl = "fused" if jax.default_backend() == "tpu" else "xla"
    if impl in ("fused", "interpret", "pallas"):
        return _fused_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps,
                          impl == "interpret")
    return xla_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2, ln_eps)
