"""FineTuner inner-loop parity vs an independent torch implementation of the
reference's personalise loop (few_shot_recognisers.py:207-246): per-batch
loss scaled by batch_len/total, backward-accumulated, one optimizer step per
grad step. Run on identical cached features; final head params must match."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


def torch_finetune_linear(feats, labels, way, num_grad_steps, lr, batch_size,
                          betas=(0.9, 0.999), eps=1e-8):
    n, d = feats.shape
    head = torch.nn.Linear(d, way)
    with torch.no_grad():
        head.weight.zero_()
        head.bias.zero_()
    opt = torch.optim.Adam(head.parameters(), lr=lr, betas=betas, eps=eps)
    f = torch.as_tensor(feats)
    y = torch.as_tensor(labels, dtype=torch.long)
    nb = (n + batch_size - 1) // batch_size
    for _ in range(num_grad_steps):
        opt.zero_grad()
        for b in range(nb):
            sl = slice(b * batch_size, min((b + 1) * batch_size, n))
            logits = head(f[sl])
            loss = torch.nn.functional.cross_entropy(logits, y[sl])
            loss = loss * (sl.stop - sl.start) / n
            loss.backward()
        opt.step()
    return (head.weight.detach().numpy(), head.bias.detach().numpy())


def test_finetuner_inner_loop_matches_torch():
    from types import SimpleNamespace

    from orbit_tpu.learners.multi_step import build_finetune_fns
    from orbit_tpu.models.recognisers import MultiStepFewShotRecogniser

    way, n, d = 4, 37, 1280   # d = efficientnet_b0 output; n not a multiple of batch_size
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((n, d)).astype(np.float32)
    labels = (np.arange(n) % way).astype(np.int32)

    args = SimpleNamespace(
        personalize_num_grad_steps=12, personalize_learning_rate=0.05,
        personalize_optimizer="adam", personalize_weight_decay=0.0,
        personalize_extractor_lr_scale=1.0, personalize_epsilon=1e-8,
        personalize_betas=(0.9, 0.999), personalize_momentum=0.0,
        batch_size=8)

    rec = MultiStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0", adapt_features=False,
        classifier="linear", batch_size=8)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=32)

    personalise, _ = build_finetune_fns(rec, args)

    n_pad = 48  # padded episode: extra rows masked out
    pad = n_pad - n
    ctx = jnp.zeros((n_pad, 1, 32, 32, 3), jnp.float32)
    lbl = jnp.asarray(np.r_[labels, np.zeros(pad)], jnp.int32)
    mask = jnp.asarray(np.r_[np.ones(n), np.zeros(pad)], jnp.float32)
    cm = jnp.asarray((np.arange(16) < way), jnp.float32)

    # our embed returns only the n real rows; pad them like the loader would
    object.__setattr__(rec, "embed_clips",
                       lambda *a, **k: jnp.concatenate(
                           [jnp.asarray(feats), jnp.zeros((pad, d), jnp.float32)]))
    tp = personalise(variables, ctx, lbl, mask, cm)

    w_ref, b_ref = torch_finetune_linear(
        feats, labels, way, args.personalize_num_grad_steps,
        args.personalize_learning_rate, args.batch_size)

    w_ours = np.asarray(tp["head"]["weight"])[:way]
    b_ours = np.asarray(tp["head"]["bias"])[:way]
    np.testing.assert_allclose(w_ours, w_ref, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(b_ours, b_ref, rtol=2e-3, atol=2e-4)
    # padded class rows never receive gradient
    assert np.abs(np.asarray(tp["head"]["weight"])[way:]).max() == 0


def test_finetuner_film_on_vit_identical_across_kernel_impls():
    """FineTuner+FiLM on a ViT: every inner grad step differentiates the
    backbone w.r.t. the FiLM'd LayerNorm scales/biases THROUGH the fused
    Pallas kernels' backwards (interpret mode here). The finetuned film +
    head params must match the pure-XLA path (reference protocol:
    multi-step-learner.py with --adapt_features)."""
    from types import SimpleNamespace

    from orbit_tpu.learners.multi_step import build_finetune_fns
    from orbit_tpu.models.recognisers import MultiStepFewShotRecogniser
    from orbit_tpu.ops.tiny_attention import force_impl

    way, n = 3, 10
    rng = np.random.default_rng(4)
    ctx = jnp.asarray(rng.standard_normal((n, 1, 64, 64, 3)) * 0.5,
                      jnp.float32)
    lbl = jnp.asarray(np.arange(n) % way, jnp.int32)
    mask = jnp.ones((n,), jnp.float32)
    cm = jnp.asarray(np.arange(16) < way, jnp.float32)

    args = SimpleNamespace(
        personalize_num_grad_steps=3, personalize_learning_rate=0.01,
        personalize_optimizer="adam", personalize_weight_decay=0.0,
        personalize_extractor_lr_scale=1.0, personalize_epsilon=1e-8,
        personalize_betas=(0.9, 0.999), personalize_momentum=0.0,
        batch_size=8)
    rec = MultiStepFewShotRecogniser(
        feature_extractor_name="vit_s_32", adapt_features=True,
        classifier="linear", batch_size=8)
    with force_impl("xla"):
        variables = jax.jit(lambda k: rec.init(k, frame_size=64))(
            jax.random.PRNGKey(0))

    results = {}
    for impl in ("xla", "interpret"):
        with force_impl(impl):
            personalise, predict = build_finetune_fns(rec, args)
            tp = jax.jit(personalise).lower(
                variables, ctx, lbl, mask, cm).compile()(
                    variables, ctx, lbl, mask, cm)
            logits = predict(variables, tp, ctx, cm)
        results[impl] = (jax.tree_util.tree_map(np.asarray, tp),
                         np.asarray(logits))

    tp_p, logits_p = results["interpret"]
    tp_x, logits_x = results["xla"]
    flat_p = jax.tree_util.tree_leaves(tp_p)
    flat_x = jax.tree_util.tree_leaves(tp_x)
    assert flat_p and len(flat_p) == len(flat_x)
    for a, b in zip(flat_p, flat_x):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(logits_p, logits_x, atol=5e-3, rtol=5e-3)
    # the film leaves actually moved (grads flowed through the kernels)
    film0 = rec.init_task_params(variables, 16)["film"]
    moved = [np.abs(np.asarray(a) - np.asarray(b)).max()
             for a, b in zip(jax.tree_util.tree_leaves(tp_p["film"]),
                             jax.tree_util.tree_leaves(film0))]
    assert max(moved) > 0
