"""bf16 eval-time extractor storage must be bit-identical to f32 storage.

Under ``dtype=bfloat16`` every Dense/Conv/LayerNorm casts its params to
bf16 at use, so pre-casting the stored tree (models/precision.py) must not
change a single bit of the output; BatchNorm affine params must stay f32
(masked_bn computes in f32).
"""
import jax
import jax.numpy as jnp
import numpy as np

from orbit_tpu.models.precision import cast_extractor_params


def _variables_like(backbone, x):
    params = jax.jit(backbone.init)(jax.random.PRNGKey(0), x)
    # mimic the recogniser tree layout: params/extractor/...
    out = {}
    for col, tree in params.items():
        out[col] = {"extractor": tree}
    return out


def test_vit_bf16_storage_bit_identical():
    from orbit_tpu.models.backbones.vit import ViT

    m = ViT(patch_size=32, dim=64, depth=2, num_heads=2, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3), jnp.bfloat16)
    variables = _variables_like(m, x)
    cast = cast_extractor_params(variables)

    y0 = np.asarray(jax.jit(m.apply)({"params": variables["params"]["extractor"]}, x))
    y1 = np.asarray(jax.jit(m.apply)({"params": cast["params"]["extractor"]}, x))
    np.testing.assert_array_equal(y0, y1)
    # every non-BN float leaf is bf16 now
    leaves = jax.tree_util.tree_leaves(cast["params"]["extractor"])
    assert all(l.dtype == jnp.bfloat16 for l in leaves)


def test_efficientnet_bn_leaves_stay_f32_and_output_identical():
    from orbit_tpu.models.backbones.efficientnet import create_efficientnet

    m, _, _ = create_efficientnet("efficientnet_b0", dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 84, 84, 3), jnp.bfloat16)
    variables = _variables_like(m, x)
    cast = cast_extractor_params(variables)

    def fwd(tree):
        v = {k: tree[k]["extractor"] for k in tree}
        return np.asarray(jax.jit(
            lambda vv, xx: m.apply(vv, xx, train=False))(v, x))

    np.testing.assert_array_equal(fwd(variables), fwd(cast))

    flat = jax.tree_util.tree_flatten_with_path(cast["params"]["extractor"])[0]
    bn = [(p, l) for p, l in flat
          if any(getattr(k, "key", str(k)).startswith("bn") for k in p)]
    assert bn, "expected BatchNorm leaves in the EfficientNet tree"
    assert all(l.dtype == jnp.float32 for _, l in bn)
    non_bn = [l for p, l in flat
              if not any(getattr(k, "key", str(k)).startswith("bn") for k in p)]
    assert all(l.dtype == jnp.bfloat16 for l in non_bn)


def test_missing_extractor_subtree_is_noop():
    variables = {"params": {"head": {"w": jnp.ones((2, 2))}}}
    assert cast_extractor_params(variables) is variables
