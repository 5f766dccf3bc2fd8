"""Parity + gradient tests for the fused tiny-sequence attention kernel.

The Pallas path runs in interpreter mode here (CPU test host); the real-TPU
compiled kernel was additionally parity-checked against the XLA path on a
v5e (rel-max-err 2.3e-3 in bf16 — see PERF.md).  The XLA reference itself is
checked against an independent hand-rolled numpy softmax attention, so the
two implementations cannot share a bug.

Reference behaviour: timm ViT attention as used by the reference's backbones
(model/feature_extractors.py:49-64).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orbit_tpu.ops.tiny_attention import tiny_attention, xla_attention


def numpy_attention(qkv: np.ndarray, num_heads: int) -> np.ndarray:
    """Independent oracle: plain numpy softmax attention."""
    n, s, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    parts = qkv.reshape(n, s, 3, num_heads, hd).astype(np.float64)
    q, k, v = parts[:, :, 0], parts[:, :, 1], parts[:, :, 2]
    out = np.empty((n, s, num_heads, hd))
    for b in range(n):
        for h in range(num_heads):
            scores = q[b, :, h] @ k[b, :, h].T / np.sqrt(hd)
            scores -= scores.max(axis=-1, keepdims=True)
            p = np.exp(scores)
            p /= p.sum(axis=-1, keepdims=True)
            out[b, :, h] = p @ v[b, :, h]
    return out.reshape(n, s, d)


def _qkv(n=4, s=50, d=128, key=0):
    return jax.random.normal(jax.random.PRNGKey(key), (n, s, 3 * d),
                             jnp.float32) * 0.5


def test_xla_matches_numpy_oracle():
    qkv = _qkv()
    ours = np.asarray(xla_attention(qkv, num_heads=2))
    oracle = numpy_attention(np.asarray(qkv), num_heads=2)
    np.testing.assert_allclose(ours, oracle, atol=2e-5)


def test_pallas_interpret_matches_xla():
    qkv = _qkv()
    p = np.asarray(tiny_attention(qkv, 2, impl="interpret"))
    x = np.asarray(tiny_attention(qkv, 2, impl="xla"))
    np.testing.assert_allclose(p, x, atol=2e-5)


def test_pallas_pads_ragged_batch():
    # n=5 is not a multiple of the 8-row batch block: exercises the pad path
    qkv = _qkv(n=5)
    p = np.asarray(tiny_attention(qkv, 2, impl="interpret"))
    x = np.asarray(tiny_attention(qkv, 2, impl="xla"))
    assert p.shape == (5, 50, 128)
    np.testing.assert_allclose(p, x, atol=2e-5)


def test_gradients_flow_through_pallas_path():
    """custom_vjp backward (XLA recompute) == direct XLA gradients."""
    qkv = _qkv(n=2, s=10, d=64)

    def loss(fn):
        return lambda t: (fn(t) ** 2).sum()

    g_p = jax.grad(loss(lambda t: tiny_attention(t, 2, impl="interpret")))(qkv)
    g_x = jax.grad(loss(lambda t: tiny_attention(t, 2, impl="xla")))(qkv)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=2e-5)


def test_vit_forward_identical_across_impls():
    from orbit_tpu.models.backbones.vit import ViT

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 224, 224, 3), jnp.float32)
    outs = {}
    for impl in ("xla", "interpret"):
        m = ViT(patch_size=32, dim=64, depth=2, num_heads=2, attn_impl=impl)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        outs[impl] = np.asarray(jax.jit(m.apply)(params, x))
    np.testing.assert_allclose(outs["interpret"], outs["xla"], atol=1e-4)


def test_bad_shapes_raise():
    with pytest.raises(ValueError):
        tiny_attention(jnp.zeros((1, 4, 100)), 3)  # 100 not divisible by 3
    with pytest.raises(ValueError):
        tiny_attention(jnp.zeros((1, 4, 96)), 5)  # 32 not divisible by 5 heads


# ------------------------------------------------- fused qkv + attention ----


def _xkb(n=5, s=50, d=128, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    x = jax.random.normal(ks[0], (n, s, d), jnp.float32) * 0.5
    kernel = jax.random.normal(ks[1], (d, 3 * d), jnp.float32) * 0.05
    bias = jax.random.normal(ks[2], (3 * d,), jnp.float32) * 0.02
    return x, kernel, bias


def test_fused_qkv_matches_numpy_oracle():
    from orbit_tpu.ops.tiny_attention import fused_qkv_attention

    x, kernel, bias = _xkb()
    ours = np.asarray(fused_qkv_attention(x, kernel, bias, 2, impl="interpret"))
    qkv = np.asarray(x) @ np.asarray(kernel) + np.asarray(bias)
    oracle = numpy_attention(qkv, num_heads=2)
    np.testing.assert_allclose(ours, oracle, atol=5e-5)


def test_fused_qkv_interpret_matches_xla():
    from orbit_tpu.ops.tiny_attention import fused_qkv_attention

    x, kernel, bias = _xkb(key=7)
    p = np.asarray(fused_qkv_attention(x, kernel, bias, 2, impl="interpret"))
    r = np.asarray(fused_qkv_attention(x, kernel, bias, 2, impl="xla"))
    np.testing.assert_allclose(p, r, atol=5e-5)


def test_fused_qkv_gradients_all_args():
    """custom_vjp backward must deliver grads to x, kernel AND bias that
    match direct XLA differentiation (LITE meta-training path)."""
    from orbit_tpu.ops.tiny_attention import fused_qkv_attention

    x, kernel, bias = _xkb(n=2, s=10, d=64, key=3)

    def loss(impl):
        return lambda xx, kk, bb: (
            fused_qkv_attention(xx, kk, bb, 2, impl=impl) ** 2).sum()

    g_p = jax.grad(loss("interpret"), argnums=(0, 1, 2))(x, kernel, bias)
    g_x = jax.grad(loss("xla"), argnums=(0, 1, 2))(x, kernel, bias)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_fused_qkv_pallas_bwd_handles_padded_batch():
    """The Pallas backward pads B to the 8-row block; padded rows must
    contribute exactly zero to dx/dW/db (n=11 -> one full + one padded
    block). Compared against the XLA-recompute backward escape hatch."""
    from orbit_tpu.ops import tiny_attention as ta

    x, kernel, bias = _xkb(n=11, s=10, d=64, key=5)

    def loss(xx, kk, bb):
        return (ta.fused_qkv_attention(xx, kk, bb, 2, impl="interpret")
                ** 2).sum()

    g_pallas = jax.grad(loss, argnums=(0, 1, 2))(x, kernel, bias)
    old = ta._PALLAS_BWD
    ta._PALLAS_BWD = False
    try:
        g_xla = jax.grad(loss, argnums=(0, 1, 2))(x, kernel, bias)
    finally:
        ta._PALLAS_BWD = old
    for a, b in zip(g_pallas, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_plain_attention_pallas_bwd_matches_escape_hatch():
    from orbit_tpu.ops import tiny_attention as ta

    qkv = _qkv(n=11, s=10, d=64, key=9)

    def loss(t):
        return (ta.tiny_attention(t, 2, impl="interpret") ** 2).sum()

    g_pallas = jax.grad(loss)(qkv)
    old = ta._PALLAS_BWD
    ta._PALLAS_BWD = False
    try:
        g_xla = jax.grad(loss)(qkv)
    finally:
        ta._PALLAS_BWD = old
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               atol=5e-5)


def test_fused_qkv_bad_params_raise():
    from orbit_tpu.ops.tiny_attention import fused_qkv_attention

    with pytest.raises(ValueError):
        fused_qkv_attention(jnp.zeros((1, 4, 64)), jnp.zeros((64, 128)),
                            jnp.zeros((128,)), 2)


def test_macs_analysis_sees_through_the_kernel():
    """XLA cost analysis cannot count inside a Pallas custom call; flops_of
    must re-lower with the XLA attention so the qkv projection GEMM (~30% of
    a ViT's MACs, counted by the reference's thop) is charged."""
    from orbit_tpu.ops.tiny_attention import fused_qkv_attention, force_impl
    from orbit_tpu.utils.ops_counter import flops_of

    x, kernel, bias = _xkb(n=8, s=16, d=64, key=11)

    def fused(xx):
        return fused_qkv_attention(xx, kernel, bias, 2, impl="interpret")

    def ref(xx):
        return fused_qkv_attention(xx, kernel, bias, 2, impl="xla")

    del force_impl  # flops_of applies it internally
    qkv_gemm_flops = 2 * 8 * 16 * 64 * (3 * 64)
    assert flops_of(ref, x) >= qkv_gemm_flops
    # flops_of internally forces the XLA path, so the fused program is
    # charged identically to the reference implementation
    assert flops_of(fused, x) == flops_of(ref, x)


def test_macs_analysis_unaffected_by_prior_jit_execution():
    """The driver executes the jitted (Pallas) personalise BEFORE analysing
    its MACs; jit-of-an-executed-jit inlines the cached Pallas trace, which
    used to bypass force_impl and hide the kernel GEMMs (2-8x MACs skew).
    flops_of must unwrap the jit and re-trace."""
    import jax as _jax

    from orbit_tpu.ops.tiny_attention import fused_qkv_attention
    from orbit_tpu.utils.ops_counter import flops_of

    x, kernel, bias = _xkb(n=8, s=16, d=64, key=13)

    @_jax.jit
    def fused(xx):
        return fused_qkv_attention(xx, kernel, bias, 2, impl="interpret")

    clean = flops_of(fused, x)
    np.asarray(fused(x))  # execute: populates the inner jit cache
    assert flops_of(fused, x) == clean
