"""Every classifier head through the full jitted personalise/predict
pipeline on a padded episode (the CLU-VE compute path), float32 and
bfloat16."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orbit_tpu.learners.steps import build_eval_fns
from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser


@pytest.mark.parametrize("classifier", ["proto", "proto_cosine", "mahalanobis", "versa"])
def test_eval_pipeline_all_heads(classifier):
    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0",
        adapt_features=(classifier == "versa"),  # versa == CNAPs config
        classifier=classifier, batch_size=8,
        logit_scale=32.0 if classifier == "proto_cosine" else 1.0)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=32)
    personalise, predict = build_eval_fns(rec)

    rng = np.random.default_rng(0)
    n, way = 12, 3
    ctx = jnp.asarray(rng.standard_normal((16, 1, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(np.r_[np.arange(n) % way, np.zeros(4)], jnp.int32)
    mask = jnp.asarray(np.r_[np.ones(n), np.zeros(4)], jnp.float32)
    class_mask = jnp.asarray((np.arange(16) < way), jnp.float32)

    state = personalise(variables, ctx, labels, mask, class_mask)
    logits = np.asarray(predict(variables, state, ctx, class_mask))
    assert logits.shape == (16, 16)
    assert np.isfinite(logits[:, :way]).all()
    # padded classes masked off
    assert (logits[:, way:] < -1e29).all()
    # softmax over masked logits is a valid distribution on real classes
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    assert np.allclose(p[:, :way].sum(-1), 1.0, atol=1e-5)
