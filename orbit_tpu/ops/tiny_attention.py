"""Fused multi-head self-attention for tiny sequences (Pallas, TPU).

Why this kernel exists. The ViT backbones run attention over S=50 tokens
(49 patches + cls at 224px/patch32 — reference: timm vit_*_patch32_224 used
by model/feature_extractors.py:49-64). At that size attention is ~1% of the
model's FLOPs but, measured on a v5e, ~40% of its wall time under plain XLA:
the (B,S,H,hd)->(B,H,S,hd) transposes, the materialised (B*H,S,S) score
tensor, and the softmax each round-trip HBM, and none of it amortises over a
50-token sequence. This kernel reads the raw qkv projection once per batch
tile, runs per-head blocked scores -> softmax -> AV entirely in VMEM (see
``_attn_kernel`` for the row-stacking trick that keeps the MXU filled), and
writes the attention output once. No flash-attention style online softmax is
needed: the scores for a whole batch tile fit in VMEM trivially.

Layout contract: ``qkv`` is the raw output of the fused qkv Dense,
shape (B, S, 3*D), whose columns are ordered [q | k | v] with heads
contiguous inside each (i.e. the (3, H, hd) reshape order that both timm and
``orbit_tpu.models.backbones.vit.Attention`` use). Head slices are therefore
static 64-aligned lane slices - no transposes anywhere.

Gradients: both ops carry a ``jax.custom_vjp``. On TPU the backward is a
second Pallas kernel (``_fused_qkv_bwd_kernel``) that recomputes the qkv
projection and softmax in VMEM and emits dx per batch block plus dW/db via
the resident-accumulator pattern (constant ``index_map`` output revisited on
every *consecutive* grid step — the one revisit order Mosaic defines), so
the fat (B,S,3D) qkv and (B·H,S,S) score tensors never touch HBM in
training either. Off TPU (and as the ``_PALLAS_BWD=False`` escape hatch)
the backward recomputes the XLA reference implementation and differentiates
that. Either way meta-training through the backbone (LITE) sees the exact
reference math's gradients.
"""
from __future__ import annotations

import contextlib
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Trace-time override used by utils/ops_counter.flops_of: XLA cost analysis
# cannot see inside a Pallas custom call, so MACs accounting re-lowers the
# program with the XLA attention path (which matches the reference's
# validated thop numbers). Set only via force_impl().
_IMPL_OVERRIDE: str | None = None

# Escape hatch / A-B harness: when False, the custom_vjp backward of the
# Pallas ops falls back to differentiating the XLA reference recompute
# (the round-2 behaviour) instead of the fused Pallas backward kernels.
_PALLAS_BWD: bool = True


@contextlib.contextmanager
def force_impl(impl: str):
    """Force every tiny_attention/fused_qkv_attention trace inside the
    context to the given impl (used for FLOPs analysis; see module note)."""
    global _IMPL_OVERRIDE
    prev = _IMPL_OVERRIDE
    _IMPL_OVERRIDE = impl
    try:
        yield
    finally:
        _IMPL_OVERRIDE = prev


@contextlib.contextmanager
def default_impl(impl: str):
    """Soft trace-time default: like :func:`force_impl` but yields to any
    override already in force (so tests/harnesses that force "pallas" or
    "interpret" around a whole train step keep winning).

    The learners' *differentiated* step bodies select their implementation
    by dispatch batch size (``learners.steps.train_impl_scope``): at
    protocol-scale batches (>= 64) the fused Pallas forward+backward
    kernels are the measured-fastest train path (125.5 vs 131.7 ms
    /task-step at ctx 256 / batch 256, ViT-B/32 @224 v5e — PERF.md "ViT
    train path"; the backward kernels run under a raised 100 MB scoped-VMEM
    budget, ``_BWD_COMPILER_PARAMS``), while at tiny batches the kernel
    grids are too short to amortise and the body is traced with
    ``default_impl("xla")`` instead (40.9 vs 48.6 ms at batch 32).
    Forward-only paths (eval, the LITE stop-gradient cache pass built by
    build_eval_fns / predict) always keep the fused kernels' 1.85x win.
    """
    global _IMPL_OVERRIDE
    if _IMPL_OVERRIDE is not None:
        yield
        return
    _IMPL_OVERRIDE = impl
    try:
        yield
    finally:
        _IMPL_OVERRIDE = None

# Batch rows per grid cell. 8 frames x 50 tokens x 2304 cols (bf16) is a
# ~1.8 MB qkv block + 0.6 MB out block: comfortably inside VMEM with double
# buffering, large enough to amortise DMA issue overhead.
_BLOCK_B = 8

# Backward kernels keep f32 parameter-grad accumulators (e.g. the qkv dW is
# d x 3d = ~7 MB f32 for ViT-B) resident in VMEM alongside the bf16 weights
# and the recomputed intermediates; that exceeds Mosaic's default 16 MB
# scoped-vmem budget on real hardware (see mlp_block._BWD_COMPILER_PARAMS
# for the measured failure). v5e VMEM is 128 MB; raise the cap for backward
# calls only.
_BWD_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


# shard_map vma utilities (shared with mlp_block and future Pallas ops)
from orbit_tpu.ops.vma import align_vma, match_cotangent_vma, out_struct  # noqa: E402


def _attn_kernel(num_heads: int, qkv_ref, out_ref):
    """Blocked attention: per head, the grid cell's nb batch rows are
    stacked into ONE (nb*S, hd) operand and attention runs as a single fat
    (nb*S, nb*S) masked matmul pair.

    Per-(row, head) 50x64 matmuls under-fill the 128x128 MXU and pay per-issue
    overhead 96x per cell; stacking trades nb-fold redundant FLOPs (the
    cross-row score blocks, masked to exp(-1e30)=0 by a block-diagonal bias)
    for MXU-shaped 400x64 operands. Measured e2e on ViT-B/32 @512 (v5e):
    60.8 -> 55.5 ms/it vs the per-(row,head) loop, 71.6 ms/it for XLA sdpa.
    Softmax rows stay per-batch-row exactly: masked columns contribute
    exp(-1e30) = 0 to both the normaliser and the AV products.
    """
    nb, s, d3 = qkv_ref.shape
    _attend_blocked(qkv_ref[...].reshape(nb * s, d3), num_heads, nb, s, out_ref)


def _block_bias(gs: int, s: int):
    """Block-diagonal additive mask: row i may only attend inside its own
    batch row's s-token span (exp(-1e30) = 0 elsewhere)."""
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (gs, gs), 0) // s
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (gs, gs), 1) // s
    return jnp.where(row_blk == col_blk, 0.0, -1e30).astype(jnp.float32)


def _head_softmax(qkv, h: int, num_heads: int, bias):
    """One head's (q, k, v, p): the masked row-stacked softmax shared by
    the forward AND backward kernels so their recomputed math can never
    drift apart."""
    d = qkv.shape[1] // 3
    hd = d // num_heads
    q = qkv[:, h * hd:(h + 1) * hd]
    k = qkv[:, d + h * hd:d + (h + 1) * hd]
    v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
    # scores[s1, s2] = <q[s1], k[s2]> : contract hd with hd (NT form, no
    # explicit transpose), f32 accumulation on the MXU.
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / math.sqrt(hd)) + bias
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    return q, k, v, p


def _attend_blocked(qkv, num_heads: int, nb: int, s: int, out_ref):
    """Shared body: blocked masked attention on a flat (nb*s, 3d) qkv."""
    gs, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    bias = _block_bias(gs, s)
    for h in range(num_heads):
        _, _, v, p = _head_softmax(qkv, h, num_heads, bias)
        out = jnp.dot(p.astype(qkv.dtype), v,
                      preferred_element_type=jnp.float32)
        out_ref[:, :, h * hd:(h + 1) * hd] = out.reshape(nb, s, hd).astype(
            out_ref.dtype)


def _pallas_attention(qkv: jax.Array, num_heads: int,
                      interpret: bool = False) -> jax.Array:
    n, s, d3 = qkv.shape
    d = d3 // 3
    nb = min(_BLOCK_B, n)
    pad = (-n) % nb
    if pad:
        qkv = jnp.pad(qkv, ((0, pad), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, num_heads),
        out_shape=out_struct((n + pad, s, d), qkv.dtype, qkv),
        grid=((n + pad) // nb,),
        in_specs=[pl.BlockSpec((nb, s, d3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv)
    return out[:n] if pad else out


def xla_attention(qkv: jax.Array, num_heads: int) -> jax.Array:
    """Reference implementation (XLA): identical math, used for the backward
    pass, for non-TPU backends, and as the parity oracle in tests."""
    n, s, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    parts = qkv.reshape(n, s, 3, num_heads, hd)
    q, k, v = parts[:, :, 0], parts[:, :, 1], parts[:, :, 2]
    out = jax.nn.dot_product_attention(q, k, v)  # scale 1/sqrt(hd) internal
    return out.reshape(n, s, d)


def _attend_blocked_bwd(qkv, g, num_heads: int, s: int, write):
    """Backward of ``_attend_blocked`` on a flat (gs, 3d) qkv with cotangent
    g (gs, d): recomputes the blocked softmax in VMEM and emits per-head f32
    gradient tiles via ``write(col_offset, tile)`` in qkv column order
    ([q heads | k heads | v heads]). Callers store the tiles into a ref with
    static column slices — the same pattern as the forward's out_ref writes.
    (A ``jnp.concatenate`` assembly lowered fine in interpret mode but real
    Mosaic rejects 1D/tile-crossing concats: "Input offsets outside of the
    first tile".)

    The block-diagonal mask makes the cross-batch-row score gradients exactly
    zero (p = exp(-1e30) = 0 there, and ds = p * (...)), so the redundant
    stacked FLOPs of the forward stay redundant-but-harmless here too.
    """
    gs, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    scale = 1.0 / math.sqrt(hd)
    bias = _block_bias(gs, s)
    for h in range(num_heads):
        q, k, v, p = _head_softmax(qkv, h, num_heads, bias)
        gh = g[:, h * hd:(h + 1) * hd]
        pb = p.astype(qkv.dtype)
        # dv[j] = sum_i p[i,j] g[i]  (contract rows of p with rows of g)
        dv = jax.lax.dot_general(pb, gh, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dp[i,j] = <g[i], v[j]>
        dp = jax.lax.dot_general(gh, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = (ds * scale).astype(qkv.dtype)
        dq = jnp.dot(dsb, k, preferred_element_type=jnp.float32)
        # dk[j] = sum_i ds[i,j] q[i]
        dk = jax.lax.dot_general(dsb, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        write(h * hd, dq)
        write(d + h * hd, dk)
        write(2 * d + h * hd, dv)


def _attn_bwd_kernel(num_heads: int, qkv_ref, g_ref, dqkv_ref):
    nb, s, d3 = qkv_ref.shape
    d = d3 // 3
    gs = nb * s

    def write(off, t):
        hd = t.shape[1]
        dqkv_ref[:, :, off:off + hd] = t.reshape(nb, s, hd).astype(
            dqkv_ref.dtype)

    _attend_blocked_bwd(qkv_ref[...].reshape(gs, d3),
                        g_ref[...].reshape(gs, d), num_heads, s, write)


def _pallas_attention_bwd(qkv, g, num_heads: int, interpret: bool = False):
    n, s, d3 = qkv.shape
    d = d3 // 3
    nb = min(_BLOCK_B, n)
    pad = (-n) % nb
    if pad:
        # zero-padded rows yield exactly-zero dqkv rows (g rows are zero and
        # the block-diagonal mask keeps them out of real rows' softmaxes)
        qkv = jnp.pad(qkv, ((0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0)))
    qkv, g = align_vma(qkv, g)
    dqkv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, num_heads),
        out_shape=out_struct((n + pad, s, d3), qkv.dtype, qkv, g),
        grid=((n + pad) // nb,),
        in_specs=[
            pl.BlockSpec((nb, s, d3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, s, d3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_BWD_COMPILER_PARAMS,
        interpret=interpret,
    )(qkv, g)
    return dqkv[:n] if pad else dqkv


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fused_attention(qkv: jax.Array, num_heads: int,
                     interpret: bool = False) -> jax.Array:
    return _pallas_attention(qkv, num_heads, interpret)


def _fused_fwd(qkv, num_heads, interpret):
    return _pallas_attention(qkv, num_heads, interpret), qkv


def _fused_bwd(num_heads, interpret, qkv, g):
    if _PALLAS_BWD:
        dqkv = _pallas_attention_bwd(qkv, g, num_heads, interpret)
    else:
        _, vjp = jax.vjp(lambda t: xla_attention(t, num_heads), qkv)
        (dqkv,) = vjp(g)
    return (match_cotangent_vma(dqkv, qkv),)


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


def tiny_attention(qkv: jax.Array, num_heads: int, *,
                   impl: str = "auto") -> jax.Array:
    """Multi-head self-attention on a raw (B, S, 3*D) qkv projection.

    impl: "auto" (Pallas on TPU, XLA elsewhere), "pallas", "interpret"
    (Pallas in interpreter mode — CPU-testable), or "xla".
    """
    d3 = qkv.shape[-1]
    if d3 % 3 or (d3 // 3) % num_heads:
        raise ValueError(f"qkv last dim {d3} not divisible into 3x{num_heads} heads")
    if _IMPL_OVERRIDE is not None:
        impl = _IMPL_OVERRIDE
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl in ("pallas", "interpret"):
        return _fused_attention(qkv, num_heads, impl == "interpret")
    return xla_attention(qkv, num_heads)


# --------------------------------------------------------------------------
# Fused qkv-projection + attention: the qkv tensor never touches HBM.
#
# At batch 512 the (B,S,3D) qkv tensor is 118 MB; under the split op the qkv
# Dense writes it to HBM and the attention kernel reads it back — ~236 MB of
# traffic per encoder layer plus two fusion boundaries. Folding the
# projection GEMM ((nb*S, D) @ (D, 3D), MXU-shaped) into the attention
# kernel removes all of it: measured e2e on ViT-B/32 @512 (v5e) this takes
# 55.5 -> 44.8 ms/it (80.5 -> 99.8 TF/s, 50.6% MFU). The weight block uses
# a constant index_map so Mosaic keeps it VMEM-resident across grid cells.
# --------------------------------------------------------------------------


def _fused_qkv_kernel(num_heads: int, x_ref, w_ref, b_ref, out_ref):
    nb, s, d = x_ref.shape
    x = x_ref[...].reshape(nb * s, d)
    qkv = (jax.lax.dot_general(
        x, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0][None, :]).astype(
            x_ref.dtype)
    _attend_blocked(qkv, num_heads, nb, s, out_ref)


def _pallas_qkv_attention(x, kernel, bias, num_heads: int,
                          interpret: bool = False):
    n, s, d = x.shape
    nb = min(_BLOCK_B, n)
    pad = (-n) % nb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    # bias rides in as an (8, 3D) broadcast: Mosaic wants block sublane
    # dims >= 8 (CLAUDE.md pallas notes)
    b8 = jnp.broadcast_to(bias.astype(x.dtype)[None, :], (8, bias.shape[0]))
    x, kb, b8 = align_vma(x, kernel.astype(x.dtype), b8)
    out = pl.pallas_call(
        functools.partial(_fused_qkv_kernel, num_heads),
        out_shape=out_struct((n + pad, s, d), x.dtype, x, kernel, bias),
        grid=((n + pad) // nb,),
        in_specs=[
            pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kernel.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b8.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, kb, b8)
    return out[:n] if pad else out


def xla_qkv_attention(x, kernel, bias, num_heads: int):
    """XLA reference: Dense-equivalent qkv projection + attention. Exactly
    the math of ``nn.Dense(3D)(x)`` followed by ``xla_attention``."""
    qkv = (jnp.dot(x, kernel.astype(x.dtype))
           + bias.astype(x.dtype)[None, None, :])
    return xla_attention(qkv, num_heads)


def _fused_qkv_bwd_kernel(num_heads: int, x_ref, g_ref, w_ref, b_ref,
                          dx_ref, dw_ref, db_ref, dqkv_scr):
    """dx per batch block; dW/db accumulated across the sequential grid in
    resident f32 VMEM blocks (constant index_map — revisited on every
    consecutive step, the defined accumulation order). The per-head dqkv
    tiles assemble in a (gs, 3d) f32 VMEM scratch via static column-slice
    stores (Mosaic rejects concatenate-based assembly; see
    _attend_blocked_bwd)."""
    nb, s, d = x_ref.shape
    gs = nb * s
    x = x_ref[...].reshape(gs, d)
    qkv = (jax.lax.dot_general(
        x, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0][None, :]).astype(
            x_ref.dtype)

    def write(off, t):
        dqkv_scr[:, off:off + t.shape[1]] = t

    _attend_blocked_bwd(qkv, g_ref[...].reshape(gs, d), num_heads, s, write)
    dqkv_f = dqkv_scr[...]
    dqkv = dqkv_f.astype(x_ref.dtype)
    db = jnp.sum(dqkv_f, axis=0, keepdims=True)  # (1, 3d) f32
    # dx = dqkv @ W^T  (contract qkv columns with W's output dim)
    dx = jax.lax.dot_general(dqkv, w_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_ref[...] = dx.reshape(nb, s, d).astype(dx_ref.dtype)
    # dW = x^T @ dqkv  (contract the gs rows)
    dw = jax.lax.dot_general(x, dqkv, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dw_ref[...] += dw
    db_ref[...] += jnp.broadcast_to(db, db_ref.shape)


def _pallas_qkv_attention_bwd(x, kernel, bias, g, num_heads: int,
                              interpret: bool = False):
    n, s, d = x.shape
    nb = min(_BLOCK_B, n)
    pad = (-n) % nb
    if pad:
        # zero x rows project to bias-only qkv, but their g rows are zero so
        # every gradient piece they touch (dqkv, hence dx/dW/db) is zero
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0)))
    b8 = jnp.broadcast_to(bias.astype(x.dtype)[None, :], (8, bias.shape[0]))
    x, g, kb, b8 = align_vma(x, g, kernel.astype(x.dtype), b8)
    dx, dw, db8 = pl.pallas_call(
        functools.partial(_fused_qkv_bwd_kernel, num_heads),
        out_shape=(
            out_struct((n + pad, s, d), x.dtype, x, g, kernel, bias),
            out_struct(kernel.shape, jnp.float32, x, g, kernel, bias),
            out_struct((8, 3 * d), jnp.float32, x, g, kernel, bias),
        ),
        grid=((n + pad) // nb,),
        in_specs=[
            pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kernel.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b8.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kernel.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 3 * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((nb * s, 3 * d), jnp.float32)],
        compiler_params=_BWD_COMPILER_PARAMS,
        interpret=interpret,
    )(x, g, kb, b8)
    if pad:
        dx = dx[:n]
    return (dx, dw.astype(kernel.dtype), db8[0].astype(bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_qkv(x, kernel, bias, num_heads: int, interpret: bool = False):
    return _pallas_qkv_attention(x, kernel, bias, num_heads, interpret)


def _fused_qkv_fwd(x, kernel, bias, num_heads, interpret):
    return (_pallas_qkv_attention(x, kernel, bias, num_heads, interpret),
            (x, kernel, bias))


def _fused_qkv_bwd(num_heads, interpret, res, g):
    x, kernel, bias = res
    if _PALLAS_BWD:
        dx, dw, db = _pallas_qkv_attention_bwd(x, kernel, bias, g, num_heads,
                                               interpret)
    else:
        # the inner vjp psums replicated-param cotangents only when the
        # pbroadcast happens INSIDE it; under shard_map the residual x is
        # already varying, so match explicitly here too (the escape hatch
        # must stay usable for A/B runs on the episode-DP train path)
        _, vjp = jax.vjp(
            lambda xx, kk, bb: xla_qkv_attention(xx, kk, bb, num_heads),
            x, kernel, bias)
        dx, dw, db = vjp(g)
    return (match_cotangent_vma(dx, x), match_cotangent_vma(dw, kernel),
            match_cotangent_vma(db, bias))


_fused_qkv.defvjp(_fused_qkv_fwd, _fused_qkv_bwd)


def fused_qkv_attention(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                        num_heads: int, *, impl: str = "auto") -> jax.Array:
    """qkv projection + multi-head attention in one op.

    x: (B, S, D) tokens; kernel: (D, 3D); bias: (3D,) — the exact params of
    the timm-layout fused qkv Dense. Returns (B, S, D) attention output
    (pre-proj). Gradients flow to x, kernel AND bias (XLA recompute in the
    backward), so meta-training with ``learn_extractor`` is unchanged.

    impl: "auto" (fused Pallas on TPU, XLA elsewhere), "fused", "interpret"
    (fused kernel, interpreter mode — CPU-testable), or "xla".
    """
    d = x.shape[-1]
    if kernel.shape != (d, 3 * d) or bias.shape != (3 * d,):
        raise ValueError(f"qkv params {kernel.shape}/{bias.shape} do not "
                         f"match token dim {d}")
    if d % num_heads:
        raise ValueError(f"dim {d} not divisible by {num_heads} heads")
    if _IMPL_OVERRIDE is not None:
        impl = _IMPL_OVERRIDE
    if impl == "auto":
        impl = "fused" if jax.default_backend() == "tpu" else "xla"
    if impl in ("fused", "interpret", "pallas"):
        return _fused_qkv(x, kernel, bias, num_heads, impl == "interpret")
    return xla_qkv_attention(x, kernel, bias, num_heads)
