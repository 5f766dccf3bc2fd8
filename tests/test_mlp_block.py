"""Parity + gradient tests for the fused MLP half-block kernel.

The interpret-mode Pallas path, the XLA path, and an independent flax
module reference (LayerNorm + Dense + exact gelu, f32) must all agree; the
in-kernel polynomial erf must match jax.nn.gelu(approximate=False).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit_tpu.ops.mlp_block import _erf_poly, fused_mlp_block, xla_mlp_block


def _inputs(n=4, s=12, d=64, hid=256, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 7)
    return (jax.random.normal(ks[0], (n, s, d), jnp.float32) * 0.5,
            1.0 + 0.1 * jax.random.normal(ks[1], (d,), jnp.float32),
            0.1 * jax.random.normal(ks[2], (d,), jnp.float32),
            jax.random.normal(ks[3], (d, hid), jnp.float32) * 0.05,
            0.02 * jax.random.normal(ks[4], (hid,), jnp.float32),
            jax.random.normal(ks[5], (hid, d), jnp.float32) * 0.05,
            0.02 * jax.random.normal(ks[6], (d,), jnp.float32))


def test_erf_poly_matches_exact():
    x = jnp.linspace(-6.0, 6.0, 4001)
    # A&S 7.1.26 is 1.5e-7 in exact arithmetic; f32 evaluation adds ~2e-6 —
    # both ~1000x below bf16 resolution
    np.testing.assert_allclose(np.asarray(_erf_poly(x)),
                               np.asarray(jax.lax.erf(x)), atol=5e-6)


def test_interpret_matches_xla():
    args = _inputs()
    p = np.asarray(fused_mlp_block(*args, impl="interpret"))
    r = np.asarray(fused_mlp_block(*args, impl="xla"))
    np.testing.assert_allclose(p, r, atol=5e-6)


def test_matches_flax_module_reference():
    """Independent oracle: the pre-fusion flax composition."""
    x, g, b, w1, b1, w2, b2 = _inputs(key=5)

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
            h = nn.Dense(w1.shape[1], name="fc1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(x.shape[-1], name="fc2")(h)
            return x + h

    variables = {"params": {"norm2": {"scale": g, "bias": b},
                            "fc1": {"kernel": w1, "bias": b1},
                            "fc2": {"kernel": w2, "bias": b2}}}
    ref = np.asarray(Ref().apply(variables, x))
    ours = np.asarray(fused_mlp_block(x, g, b, w1, b1, w2, b2,
                                      impl="interpret"))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_gradients_all_args():
    args = _inputs(n=2, s=6, d=32, hid=64, key=3)

    def loss(impl):
        return lambda *a: (fused_mlp_block(*a, impl=impl) ** 2).sum()

    g_p = jax.grad(loss("interpret"), argnums=tuple(range(7)))(*args)
    g_x = jax.grad(loss("xla"), argnums=tuple(range(7)))(*args)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_ragged_batch_pads():
    args = _inputs(n=5, key=9)
    p = np.asarray(fused_mlp_block(*args, impl="interpret"))
    r = np.asarray(fused_mlp_block(*args, impl="xla"))
    assert p.shape == r.shape == (5, 12, 64)
    np.testing.assert_allclose(p, r, atol=5e-6)


def test_pallas_bwd_handles_padded_batch():
    """n=11 forces a zero-padded final block through the Pallas backward's
    resident accumulators; grads must match the XLA-recompute escape hatch
    exactly (padded rows contribute zero to every dW/db colsum)."""
    from orbit_tpu.ops import tiny_attention as ta

    args = _inputs(n=11, s=6, d=32, hid=64, key=13)

    def loss(*a):
        return (fused_mlp_block(*a, impl="interpret") ** 2).sum()

    g_pallas = jax.grad(loss, argnums=tuple(range(7)))(*args)
    old = ta._PALLAS_BWD
    ta._PALLAS_BWD = False
    try:
        g_xla = jax.grad(loss, argnums=tuple(range(7)))(*args)
    finally:
        ta._PALLAS_BWD = old
    for a, b in zip(g_pallas, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_vit_gradients_identical_across_impls():
    """End-to-end: a tiny ViT differentiated through BOTH fused kernels'
    Pallas backwards matches the same model on the pure-XLA path."""
    from orbit_tpu.models.backbones.vit import ViT

    x = jax.random.normal(jax.random.PRNGKey(4), (3, 64, 64, 3), jnp.float32)
    grads = {}
    for impl in ("xla", "interpret"):
        m = ViT(patch_size=32, dim=64, depth=2, num_heads=2, attn_impl=impl)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)

        def loss(p):
            return (m.apply(p, x) ** 2).sum()

        grads[impl] = jax.grad(loss)(params)
    flat_p, _ = jax.tree_util.tree_flatten(grads["interpret"])
    flat_x, _ = jax.tree_util.tree_flatten(grads["xla"])
    for a, b in zip(flat_p, flat_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_bad_shapes_raise():
    x, g, b, w1, b1, w2, b2 = _inputs()
    with pytest.raises(ValueError):
        fused_mlp_block(x, g, b, w1[:, :100], b1[:100], w2, b2)
