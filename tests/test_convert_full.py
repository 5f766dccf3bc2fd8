"""Full reference-checkpoint conversion: fabricate a complete CNAPs
state_dict (feature_extractor + set_encoder + film_generator + versa
classifier) with the reference's exact naming/indexing, convert, and check
the result loads into our recogniser variables with every leaf mapped to the
right place."""
import numpy as np
import pytest
import torch

import jax

from orbit_tpu.models.convert import (_film_torch_name,
                                      convert_recogniser_checkpoint)
from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser
from tests.test_convert import fake_timm_efficientnet_b0, tree_shapes


@pytest.fixture(scope="module")
def cnaps_recogniser():
    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0", adapt_features=True,
        classifier="versa", batch_size=8)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=64)
    return rec, variables


def fake_reference_checkpoint(rec):
    sd = {}
    for k, v in fake_timm_efficientnet_b0().items():
        sd[f"feature_extractor.{k}"] = v

    # set encoder: 5x Sequential[conv(0), bn(1), relu(2), maxpool(3)]
    in_ch = 3
    for i in range(1, 6):
        p = f"set_encoder.encoder.layer{i}"
        sd[f"{p}.0.weight"] = np.random.randn(64, in_ch, 3, 3).astype(np.float32) * 0.05
        sd[f"{p}.0.bias"] = np.zeros(64, np.float32)
        sd[f"{p}.1.weight"] = np.ones(64, np.float32)
        sd[f"{p}.1.bias"] = np.zeros(64, np.float32)
        sd[f"{p}.1.running_mean"] = np.zeros(64, np.float32)
        sd[f"{p}.1.running_var"] = np.ones(64, np.float32)
        in_ch = 64

    # film generator: ModuleList/ParameterList indexed by sorted torch names
    torch_names = sorted(_film_torch_name(path, "efficientnet_b0")
                         for path, _ in rec.film_spec)
    sizes = {_film_torch_name(path, "efficientnet_b0"): size
             for path, size in rec.film_spec}
    for i, name in enumerate(torch_names):
        size = sizes[name]
        p = f"film_generator.generators.{i}"
        sd[f"{p}.block.0.weight"] = np.random.randn(64, 64).astype(np.float32) * 0.05
        sd[f"{p}.block.0.bias"] = np.zeros(64, np.float32)
        sd[f"{p}.block.1.weight"] = np.ones(64, np.float32)
        sd[f"{p}.block.1.bias"] = np.zeros(64, np.float32)
        sd[f"{p}.block.3.weight"] = np.random.randn(size, 64).astype(np.float32) * 0.05
        sd[f"{p}.block.3.bias"] = np.zeros(size, np.float32)
        # distinctive marker: regulariser i filled with value i
        sd[f"film_generator.regularizers.{i}"] = np.full(size, float(i), np.float32)

    for proc in ("weight_processor", "bias_processor"):
        out = 1280 if proc == "weight_processor" else 1
        dims = [(1280, out), (out, out), (out, out)]
        for lin, (i_d, o_d) in zip(("linear1", "linear2", "linear3"), dims):
            sd[f"classifier.{proc}.{lin}.weight"] = np.random.randn(o_d, i_d).astype(np.float32) * 0.02
            sd[f"classifier.{proc}.{lin}.bias"] = np.zeros(o_d, np.float32)
    return sd


def test_full_checkpoint_roundtrip(cnaps_recogniser):
    rec, variables = cnaps_recogniser
    sd = fake_reference_checkpoint(rec)
    converted = convert_recogniser_checkpoint(sd, rec, variables)

    assert tree_shapes(converted["params"]) == tree_shapes(variables["params"])
    assert tree_shapes(converted["batch_stats"]) == tree_shapes(variables["batch_stats"])

    # regulariser markers landed on the right generator slots
    torch_names = sorted(_film_torch_name(path, "efficientnet_b0")
                         for path, _ in rec.film_spec)
    idx_of = {n: i for i, n in enumerate(torch_names)}
    fg = converted["params"]["film_generator"]
    for path, _ in rec.film_spec:
        tag = "_".join(path)
        expected = idx_of[_film_torch_name(path, "efficientnet_b0")]
        assert float(np.asarray(fg[f"reg__{tag}"]).ravel()[0]) == expected

    # converted variables run the full personalise/predict pipeline
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((4, 1, 64, 64, 3)), jnp.float32)
    labels = jnp.asarray([0, 0, 1, 1], jnp.int32)
    mask = jnp.ones((4,), jnp.float32)
    state = rec.personalise(converted, ctx, labels, mask, 16)
    logits = rec.predict(converted, state, ctx,
                         class_mask=jnp.asarray((np.arange(16) < 2), jnp.float32))
    assert logits.shape == (4, 16)
    assert np.isfinite(np.asarray(logits)).all()
