"""End-to-end meta-learning sanity: gradient updates through the jitted
train step must reduce episodic loss on colour-separable synthetic tasks
(the learning dynamics the reference realises with torch autograd +
optimizer.step, single-step-learner.py:149-166)."""
import numpy as np
import pytest
from types import SimpleNamespace

import jax
import jax.numpy as jnp

from orbit_tpu.learners import steps as steps_lib
from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser
from orbit_tpu.utils.optim import init_optimizer


def colour_episode(rng, way=3, n_ctx=12, n_tgt=12, size=32):
    """Classes are distinct colours + noise: linearly separable, so a
    learnable extractor must drive episodic CE down quickly."""
    colours = rng.uniform(-1.5, 1.5, size=(way, 3)).astype(np.float32)

    def clips(labels):
        base = colours[labels][:, None, None, None, :]
        noise = rng.normal(0, 0.3, size=(len(labels), 1, size, size, 3))
        return (base + noise).astype(np.float32)

    ctx_labels = np.arange(n_ctx) % way
    tgt_labels = np.arange(n_tgt) % way
    return {
        "context_clips": clips(ctx_labels),
        "context_labels": ctx_labels.astype(np.int32),
        "context_mask": np.ones(n_ctx, np.float32),
        "class_mask": (np.arange(16) < way).astype(np.float32),
        "target_clips": clips(tgt_labels),
        "target_labels": tgt_labels.astype(np.int32),
        "target_mask": np.ones(n_tgt, np.float32),
    }


def test_lite_grads_equal_full_backprop_at_full_subset():
    """With num_lite_samples == len(context) and the whole target set in one
    batch, LITE's loss collapses to the non-LITE loss exactly:
    scaling = n/(L*tpb) = 1/tpb and the grad subset covers everything
    (single-step-learner.py:231 vs :203), so gradients must match."""
    n = 8
    args = SimpleNamespace(tasks_per_batch=4, learn_extractor=True,
                           with_lite=True, num_lite_samples=n, batch_size=n,
                           optimizer="adam", learning_rate=1e-3,
                           weight_decay=0.0, betas=(0.9, 0.999), epsilon=1e-8)
    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0", adapt_features=True,
        classifier="proto", batch_size=n, learn_extractor=True,
        num_lite_samples=n)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=32)

    rng = np.random.default_rng(3)
    ep = {k: jnp.asarray(v) for k, v in
          colour_episode(rng, way=3, n_ctx=n, n_tgt=n).items()}

    lite_fn = steps_lib.build_train_task_lite(rec, args)
    full_fn = steps_lib.build_train_task(rec, args)
    g_lite, l_lite, _, _ = lite_fn(variables, ep, jax.random.PRNGKey(1))
    g_full, l_full, _, _ = full_fn(variables, ep, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(l_lite), float(l_full), rtol=1e-5)
    flat_l = jax.tree_util.tree_flatten_with_path(g_lite)[0]
    flat_f = dict(jax.tree_util.tree_flatten_with_path(g_full)[0])
    for key, a in flat_l:
        b = flat_f[key]
        # the two paths reassociate f32 sums differently (scatter + cached
        # recompute vs direct), so compare against each leaf's scale rather
        # than elementwise relative error (tiny elements otherwise dominate)
        a, b = np.asarray(a), np.asarray(b)
        tol = 5e-2 * float(np.abs(b).max()) + 2e-4
        assert float(np.abs(a - b).max()) <= tol, \
            f"{jax.tree_util.keystr(key)}: max diff {np.abs(a - b).max()} vs tol {tol}"


@pytest.mark.parametrize("batch_size", [3, 5, 6, 7])
def test_lite_small_batch_size_tail(batch_size):
    """Regression (round-5 review): a tail batch with fewer rows than
    ``batch_size`` whose 8-row round-up lands ON ``batch_size`` used to be
    misclassified as a full scan batch, reshaping rows that don't exist
    (trace-time crash for every --batch_size in {3,5,6,7} against a 16-row
    target bucket). The tail must run through the padded-tail branch."""
    m = 16
    args = SimpleNamespace(tasks_per_batch=1, learn_extractor=True,
                           with_lite=True, num_lite_samples=4,
                           batch_size=batch_size,
                           optimizer="adam", learning_rate=1e-3,
                           weight_decay=0.0, betas=(0.9, 0.999), epsilon=1e-8)
    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0", classifier="proto",
        batch_size=batch_size, learn_extractor=True, num_lite_samples=4)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=32)
    rng = np.random.default_rng(5)
    ep = {k: jnp.asarray(v) for k, v in
          colour_episode(rng, way=3, n_ctx=8, n_tgt=m).items()}
    task_fn = steps_lib.build_train_task_lite(rec, args)
    grads, loss, logits, _ = task_fn(variables, ep, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert logits.shape[0] == m
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


@pytest.mark.parametrize("with_lite", [False, True])
def test_meta_training_reduces_loss(with_lite):
    # cosine head: scale-invariant logits so CE starts near ln(way) and the
    # learning signal is visible within a few dozen updates
    args = SimpleNamespace(tasks_per_batch=1, learn_extractor=True,
                           with_lite=with_lite, num_lite_samples=6,
                           batch_size=12, optimizer="adam", learning_rate=1e-3,
                           weight_decay=0.0, betas=(0.9, 0.999), epsilon=1e-8)
    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0", adapt_features=False,
        classifier="proto_cosine", batch_size=12, learn_extractor=True,
        num_lite_samples=6, logit_scale=10.0)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=32)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    tx, opt_state = init_optimizer(params, args)
    apply_update = steps_lib.build_apply_update(tx)
    build = (steps_lib.build_train_task_lite if with_lite
             else steps_lib.build_train_task)
    train_fn = build(rec, args)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    losses = []
    grads_acc = None
    n_tasks = 24
    for step in range(n_tasks):
        ep = {k: jnp.asarray(v) for k, v in colour_episode(rng).items()}
        key, sub = jax.random.split(key)
        grads, loss, _, new_stats = train_fn({"params": params, **rest}, ep, sub)
        if new_stats is not None:
            rest = {**rest, "batch_stats": {**rest["batch_stats"], "extractor": new_stats}}
        losses.append(float(loss))
        grads_acc = grads if grads_acc is None else steps_lib.accumulate_grads(grads_acc, grads)
        if (step + 1) % args.tasks_per_batch == 0:
            params, opt_state = apply_update(params, opt_state, grads_acc)
            grads_acc = None

    early = np.mean(losses[:4])
    late = np.mean(losses[-4:])
    assert late < early * 0.8, f"meta-training did not learn: {early:.4f} -> {late:.4f}"


def test_lite_vit_grads_identical_pallas_vs_xla_backward():
    """The full LITE train step (stop_gradient cache + remat'd grad chunks +
    scan over target batches) differentiated through the Pallas fused
    attention/MLP kernels' BACKWARD kernels (interpret mode) must match the
    pure-XLA path — this is the train-path contract of
    orbit_tpu/ops/{tiny_attention,mlp_block}.py's custom_vjps."""
    from orbit_tpu.ops.tiny_attention import force_impl

    n = 8
    args = SimpleNamespace(tasks_per_batch=2, learn_extractor=True,
                           with_lite=True, num_lite_samples=4, batch_size=4,
                           optimizer="adam", learning_rate=1e-3,
                           weight_decay=0.0, betas=(0.9, 0.999), epsilon=1e-8)
    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="vit_s_32", adapt_features=False,
        classifier="proto", batch_size=4, learn_extractor=True,
        num_lite_samples=4)
    with force_impl("xla"):
        variables = jax.jit(lambda k: rec.init(k, frame_size=64))(
            jax.random.PRNGKey(0))

    rng = np.random.default_rng(7)
    ep = {k: jnp.asarray(v) for k, v in
          colour_episode(rng, way=3, n_ctx=n, n_tgt=n, size=64).items()}
    key = jax.random.PRNGKey(5)
    lite_fn = steps_lib.build_train_task_lite(rec, args)

    grads = {}
    for impl in ("xla", "interpret"):
        with force_impl(impl):
            grads[impl] = jax.jit(lite_fn).lower(
                variables, ep, key).compile()(variables, ep, key)[0]
    flat_p, _ = jax.tree_util.tree_flatten(grads["interpret"])
    flat_x, _ = jax.tree_util.tree_flatten(grads["xla"])
    assert flat_p and len(flat_p) == len(flat_x)
    for a, b in zip(flat_p, flat_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)


def test_lite_vit_film_grads_flow_through_kernel_backward():
    """CNAPs-style config on a ViT (adapt_features, frozen extractor): the
    FiLM-adapted norm2 scale/bias enter the fused MLP kernel as VALUES, so
    the set-encoder/film-generator gradient arrives exclusively through the
    kernel backward's dgamma/dbeta — it must match the XLA path and be
    non-zero."""
    from orbit_tpu.ops.tiny_attention import force_impl

    n = 8
    args = SimpleNamespace(tasks_per_batch=2, learn_extractor=False,
                           with_lite=True, num_lite_samples=4, batch_size=4,
                           optimizer="adam", learning_rate=1e-3,
                           weight_decay=0.0, betas=(0.9, 0.999), epsilon=1e-8)
    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="vit_s_32", adapt_features=True,
        classifier="proto", batch_size=4, learn_extractor=False,
        num_lite_samples=4)
    with force_impl("xla"):
        variables = jax.jit(lambda k: rec.init(k, frame_size=64))(
            jax.random.PRNGKey(1))

    rng = np.random.default_rng(9)
    ep = {k: jnp.asarray(v) for k, v in
          colour_episode(rng, way=3, n_ctx=n, n_tgt=n, size=64).items()}
    key = jax.random.PRNGKey(2)
    lite_fn = steps_lib.build_train_task_lite(rec, args)

    grads = {}
    for impl in ("xla", "interpret"):
        with force_impl(impl):
            grads[impl] = jax.jit(lite_fn).lower(
                variables, ep, key).compile()(variables, ep, key)[0]
    gen_p = grads["interpret"]["film_generator"]
    gen_x = grads["xla"]["film_generator"]
    flat_p = jax.tree_util.tree_leaves(gen_p)
    flat_x = jax.tree_util.tree_leaves(gen_x)
    assert flat_p and any(np.abs(np.asarray(t)).max() > 0 for t in flat_p)
    for a, b in zip(flat_p, flat_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)
