"""Backbone shape/film-spec tests (reference parity targets:
model/feature_extractors.py:37-79, model/film.py:38-94)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit_tpu.models.backbones import create_feature_extractor
from orbit_tpu.models.film import apply_film, get_initial_film_values


@pytest.mark.parametrize("name,out_dim", [
    ("efficientnet_b0", 1280),
    ("efficientnet_v2_s", 1280),
    ("vit_s_32", 384),
    ("vit_b_32", 768),
    ("vit_b_32_clip", 768),
])
def test_backbone_output_shape(name, out_dim):
    module, output_size, film_spec = create_feature_extractor(name)
    assert output_size == out_dim
    x = jnp.zeros((2, 64, 64, 3)) if "efficientnet" in name else jnp.zeros((2, 224, 224, 3))
    variables = module.init(jax.random.PRNGKey(0), x)
    y = module.apply(variables, x)
    assert y.shape == (2, out_dim)
    assert y.dtype == jnp.float32
    # every film-spec path exists in the param tree with the declared size
    init_vals = get_initial_film_values(variables["params"], film_spec)
    for (path, size) in film_spec:
        assert init_vals[path].shape == (size,), path


def test_vit_film_spec_counts():
    # 12 blocks x (norm1, norm2) x (scale, bias) + final norm x 2 = 50 leaves
    _, _, spec = create_feature_extractor("vit_b_32")
    assert len(spec) == 12 * 2 * 2 + 2


def test_efficientnet_b0_film_spec_counts():
    # root bn1+bn2 + 15 InvertedResidual bn2 (ds block not tagged) = 17 layers x 2
    _, _, spec = create_feature_extractor("efficientnet_b0")
    assert len(spec) == (2 + 15) * 2


def test_efficientnet_v2s_film_spec_counts():
    # root 2 + cn 2 + er 8 + ir 30 = 42 layers x 2 leaves
    _, _, spec = create_feature_extractor("efficientnet_v2_s")
    assert len(spec) == (2 + 2 + 8 + 30) * 2


def test_film_override_changes_output():
    module, _, film_spec = create_feature_extractor("vit_s_32")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 224, 224, 3))
    variables = module.init(jax.random.PRNGKey(0), x)
    y0 = module.apply(variables, x)

    # identity film: exact same output
    identity = get_initial_film_values(variables["params"], film_spec)
    params_id = apply_film(variables["params"], identity)
    y1 = module.apply({"params": params_id, **{k: v for k, v in variables.items() if k != "params"}}, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)

    # perturbed film: different output
    perturbed = {p: v * 2.0 + 0.1 for p, v in identity.items()}
    params_p = apply_film(variables["params"], perturbed)
    y2 = module.apply({"params": params_p}, x)
    assert not np.allclose(np.asarray(y0), np.asarray(y2), atol=1e-3)


def test_backbone_jit_and_bf16():
    module, out_dim, _ = create_feature_extractor("efficientnet_b0")
    x = jnp.zeros((2, 32, 32, 3))
    variables = module.init(jax.random.PRNGKey(0), x)
    y = jax.jit(lambda v, x: module.apply(v, x))(variables, x)
    assert y.shape == (2, out_dim)

    mod16, _, _ = create_feature_extractor("efficientnet_b0", dtype=jnp.bfloat16)
    y16 = mod16.apply(variables, x)
    assert y16.dtype == jnp.float32  # features are cast back to f32


def test_efficientnet_batch_stats_update_only_when_training():
    module, _, _ = create_feature_extractor("efficientnet_b0")
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    variables = module.init(jax.random.PRNGKey(0), x)
    # eval: no mutable collections needed
    module.apply(variables, x, train=False)
    # train: batch_stats must be mutable and change
    y, updates = module.apply(variables, x, train=True, mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))
