"""Fused MBConv-tail depthwise op (orbit_tpu/ops/depthwise.py).

The op is the round-4 measured-losing Pallas experiment behind
``efficientnet.DW_FUSED`` (PERF.md "Why EfficientNet-B0 sits at ~10% MFU"):
it stays correct and selectable so the measurement is reproducible. These
tests pin (a) kernel math == the XLA reference (interpret mode on CPU),
(b) gradients flow through the custom_vjp's XLA-recompute backward, and
(c) the DW_FUSED in-model wiring is output- and param-tree-identical to
the composed path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit_tpu.ops.depthwise import fused_dw_act, xla_fused_dw


def _case(rng, h, w, c, k):
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal((k, k, 1, c)) * 0.2, jnp.float32)
    affines = tuple(jnp.asarray(rng.standard_normal(c), jnp.float32)
                    for _ in range(4))
    return x, wt, affines


@pytest.mark.parametrize("h,w,c,k", [(14, 14, 48, 3), (9, 11, 136, 5),
                                     (7, 7, 256, 3)])
@pytest.mark.parametrize("act1,act2", [(True, True), (False, True)])
def test_kernel_matches_xla_reference(h, w, c, k, act1, act2):
    rng = np.random.default_rng(0)
    x, wt, (a1, b1, a2, b2) = _case(rng, h, w, c, k)
    ref = np.asarray(fused_dw_act(x, wt, a1, b1, a2, b2, stride=1,
                                  act1=act1, act2=act2, impl="xla"),
                     np.float32)
    out = np.asarray(fused_dw_act(x, wt, a1, b1, a2, b2, stride=1,
                                  act1=act1, act2=act2, impl="interpret"),
                     np.float32)
    err = np.abs(out - ref).max() / max(1e-6, np.abs(ref).max())
    assert err < 2e-2  # bf16 reassociation only


def test_stride2_routes_to_xla_and_matches_conv():
    """stride 2 has no Pallas path; auto must fall back, same math."""
    rng = np.random.default_rng(1)
    x, wt, (a1, b1, a2, b2) = _case(rng, 14, 14, 64, 3)
    auto = fused_dw_act(x, wt, a1, b1, a2, b2, stride=2, impl="auto")
    ref = xla_fused_dw(x, wt, a1, b1, a2, b2, 2, True, True)
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(ref))
    assert auto.shape == (2, 7, 7, 64)


def test_gradients_flow_through_custom_vjp():
    """The interpret-mode forward differentiates via the XLA recompute
    backward; grads must match differentiating the XLA forward directly."""
    rng = np.random.default_rng(2)
    x, wt, (a1, b1, a2, b2) = _case(rng, 8, 8, 128, 3)
    xf = x.astype(jnp.float32)

    def loss(impl, xx, ww):
        y = fused_dw_act(xx.astype(jnp.bfloat16), ww, a1, b1, a2, b2,
                         stride=1, impl=impl)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gx_p, gw_p = jax.grad(lambda *a: loss("interpret", *a),
                          argnums=(0, 1))(xf, wt)
    gx_x, gw_x = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1))(xf, wt)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-4, atol=1e-4)


def test_model_wiring_parity_and_param_tree():
    """DW_FUSED=True (XLA route on CPU) == composed path; identical trees."""
    import orbit_tpu.models.backbones.efficientnet as eff

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.bfloat16)
    m, _, _ = eff.create_efficientnet("efficientnet_b0", dtype=jnp.bfloat16)
    v = jax.jit(lambda k: m.init(k, x[:1]))(jax.random.PRNGKey(0))
    try:
        eff.DW_FUSED = False
        ref = np.asarray(m.apply(v, x), np.float32)
        eff.DW_FUSED = True
        out = np.asarray(m.apply(v, x), np.float32)
        v2 = jax.jit(lambda k: m.init(k, x[:1]))(jax.random.PRNGKey(0))
    finally:
        eff.DW_FUSED = False
    err = np.abs(out - ref).max() / max(1e-6, np.abs(ref).max())
    assert err < 2e-2
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))
