"""End-to-end CNAPs parity: run the SAME fabricated reference checkpoint
through (a) an independent PyTorch implementation of the reference's
personalise+predict pipeline (set encoder -> FiLM generator -> adapted
EfficientNet -> Versa head; model/few_shot_recognisers.py:313-326,453-462)
and (b) our converted recogniser — logits must match. This numerically
validates convert_recogniser_checkpoint and every model component at once."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from orbit_tpu.models.convert import _film_torch_name, convert_recogniser_checkpoint
from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser
from tests.test_convert_full import fake_reference_checkpoint
from tests.test_torch_parity import torch_efficientnet_b0_forward


def torch_set_encoder(sd, frames):
    """SimplePrePoolNet (set_encoders.py:81-120): 5x [conv3x3 pad1, BN(eval),
    ReLU, maxpool2] -> adaptive avg pool -> mean over frames."""
    x = frames
    for i in range(1, 6):
        p = f"set_encoder.encoder.layer{i}"
        x = F.conv2d(x, torch.as_tensor(sd[f"{p}.0.weight"]),
                     torch.as_tensor(sd[f"{p}.0.bias"]), padding=1)
        x = F.batch_norm(x, torch.as_tensor(sd[f"{p}.1.running_mean"]),
                         torch.as_tensor(sd[f"{p}.1.running_var"]),
                         torch.as_tensor(sd[f"{p}.1.weight"]),
                         torch.as_tensor(sd[f"{p}.1.bias"]),
                         training=False, eps=1e-5)
        x = F.relu(x)
        x = F.max_pool2d(x, 2, 2)
    x = x.mean(dim=(2, 3))          # adaptive avg pool to 1x1
    return x.mean(dim=0)            # aggregate over the set -> (64,)


def torch_dense_block(sd, prefix, x):
    """DenseBlock (mlps.py:52-63): Linear -> LayerNorm -> ReLU -> Linear."""
    x = x @ torch.as_tensor(sd[f"{prefix}.block.0.weight"]).T + torch.as_tensor(sd[f"{prefix}.block.0.bias"])
    x = F.layer_norm(x, (x.shape[-1],), torch.as_tensor(sd[f"{prefix}.block.1.weight"]),
                     torch.as_tensor(sd[f"{prefix}.block.1.bias"]))
    x = F.relu(x)
    return x @ torch.as_tensor(sd[f"{prefix}.block.3.weight"]).T + torch.as_tensor(sd[f"{prefix}.block.3.bias"])


def torch_film_params(sd, rec, emb):
    """FilmParameterGenerator forward (feature_adapters.py:66-78)."""
    torch_names = sorted(_film_torch_name(p, "efficientnet_b0") for p, _ in rec.film_spec)
    idx_of = {n: i for i, n in enumerate(torch_names)}
    film = {}
    for path, _ in rec.film_spec:
        name = _film_torch_name(path, "efficientnet_b0")
        i = idx_of[name]
        g = torch_dense_block(sd, f"film_generator.generators.{i}", emb).squeeze()
        reg = torch.as_tensor(sd[f"film_generator.regularizers.{i}"])
        init = torch.as_tensor(sd[f"feature_extractor.{name}"])
        if name.endswith("weight"):   # multiplicative on the initial value
            film[name] = init * (g * reg + 1.0)
        else:
            film[name] = init + g * reg
    return film


def torch_dense_residual(sd, prefix, x):
    """DenseResidualBlock (mlps.py:33-50)."""
    h = x @ torch.as_tensor(sd[f"{prefix}.linear1.weight"]).T + torch.as_tensor(sd[f"{prefix}.linear1.bias"])
    h = F.elu(h)
    h = h @ torch.as_tensor(sd[f"{prefix}.linear2.weight"]).T + torch.as_tensor(sd[f"{prefix}.linear2.bias"])
    h = F.elu(h)
    h = h @ torch.as_tensor(sd[f"{prefix}.linear3.weight"]).T + torch.as_tensor(sd[f"{prefix}.linear3.bias"])
    return h + x if x.shape[-1] == h.shape[-1] else h


def torch_cnaps_personalise_predict(sd, rec, ctx, labels, way, query):
    """The reference SingleStep pipeline in torch (eval-mode BN everywhere)."""
    emb = torch_set_encoder(sd, ctx)
    film = torch_film_params(sd, rec, emb)
    ex_sd = {k[len("feature_extractor."):]: v for k, v in sd.items()
             if k.startswith("feature_extractor.")}
    ex_sd.update({k: v.numpy() for k, v in film.items()})

    ctx_feats = torch_efficientnet_b0_forward(ex_sd, ctx)
    means = torch.stack([ctx_feats[torch.as_tensor(labels) == c].mean(dim=0)
                         for c in range(way)])
    w = torch_dense_residual(sd, "classifier.weight_processor", means)
    b = torch_dense_residual(sd, "classifier.bias_processor", means).reshape(-1)
    q_feats = torch_efficientnet_b0_forward(ex_sd, query)
    return q_feats @ w.T + b


def test_cnaps_meta_gradients_match_torch():
    """Meta-TRAINING gradient parity: one train-task step (CE/tasks_per_batch
    + 1e-3 film-regulariser L2, frozen extractor — single-step-learner.py:
    196-210) must produce the same gradients on the set encoder, FiLM
    generator and Versa hyper-nets as torch autograd through the independent
    reference pipeline. This is the backward-pass complement of the forward
    parity test below; accuracy parity dies here second."""
    from types import SimpleNamespace

    from orbit_tpu.learners.steps import build_train_task

    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0", adapt_features=True,
        classifier="versa", batch_size=64)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=64)
    sd = fake_reference_checkpoint(rec)
    for k in list(sd):
        if k.startswith("film_generator.regularizers."):
            sd[k] = np.full_like(sd[k], 0.01)
    converted = convert_recogniser_checkpoint(sd, rec, variables)

    rng = np.random.default_rng(1)
    way, n_ctx, n_q, tpb = 3, 9, 6, 4
    ctx = rng.standard_normal((n_ctx, 64, 64, 3)).astype(np.float32)
    labels = (np.arange(n_ctx) % way).astype(np.int32)
    query = rng.standard_normal((n_q, 64, 64, 3)).astype(np.float32)
    qlabels = (np.arange(n_q) % way).astype(np.int32)

    # ---- torch side: leaf tensors with grad on the trainable components ----
    def trainable(k):
        # BN running stats are buffers, not parameters
        return (k.startswith(("set_encoder.", "film_generator.", "classifier."))
                and not k.endswith(("running_mean", "running_var")))

    t_sd = {k: torch.tensor(np.asarray(v), requires_grad=trainable(k))
            for k, v in sd.items()}
    ctx_t = torch.as_tensor(ctx).permute(0, 3, 1, 2)
    q_t = torch.as_tensor(query).permute(0, 3, 1, 2)

    emb = torch_set_encoder(t_sd, ctx_t)
    film = torch_film_params(t_sd, rec, emb)
    ex_sd = {k[len("feature_extractor."):]: v for k, v in t_sd.items()
             if k.startswith("feature_extractor.")}
    ex_sd.update(film)                      # keep the graph (no .numpy())
    ctx_feats = torch_efficientnet_b0_forward(ex_sd, ctx_t)
    means = torch.stack([ctx_feats[torch.as_tensor(labels) == c].mean(dim=0)
                         for c in range(way)])
    w = torch_dense_residual(t_sd, "classifier.weight_processor", means)
    b = torch_dense_residual(t_sd, "classifier.bias_processor", means).reshape(-1)
    q_feats = torch_efficientnet_b0_forward(ex_sd, q_t)
    logits = q_feats @ w.T + b
    l2 = sum((t_sd[k] ** 2).sum() for k in t_sd
             if k.startswith("film_generator.regularizers."))
    loss_t = F.cross_entropy(logits, torch.as_tensor(qlabels).long()) / tpb + 1e-3 * l2
    loss_t.backward()

    # ---- jax side: the actual compiled train step ----
    args = SimpleNamespace(tasks_per_batch=tpb, learn_extractor=False,
                           with_lite=False, num_lite_samples=4, batch_size=64)
    task_fn = build_train_task(rec, args)
    episode = {
        "context_clips": jnp.asarray(ctx[:, None]),
        "context_labels": jnp.asarray(labels),
        "context_mask": jnp.ones((n_ctx,), jnp.float32),
        "class_mask": jnp.asarray((np.arange(16) < way), jnp.float32),
        "target_clips": jnp.asarray(query[:, None]),
        "target_labels": jnp.asarray(qlabels),
        "target_mask": jnp.ones((n_q,), jnp.float32),
    }
    grads, loss_j, _, _ = task_fn(converted, episode, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(loss_j), loss_t.detach().item(), rtol=2e-3)

    def close(ours, theirs):
        np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                                   rtol=5e-3, atol=2e-5)

    # every film regulariser's gradient (ordering: sorted torch names)
    torch_names = sorted(_film_torch_name(p, "efficientnet_b0")
                         for p, _ in rec.film_spec)
    idx_of = {n: i for i, n in enumerate(torch_names)}
    for path, _ in rec.film_spec:
        tag = ".".join(path).replace(".", "_")
        i = idx_of[_film_torch_name(path, "efficientnet_b0")]
        close(grads["film_generator"][f"reg__{tag}"],
              t_sd[f"film_generator.regularizers.{i}"].grad)
        # one generator dense layer per leaf (torch Linear weight is (O, I))
        close(grads["film_generator"][f"gen__{tag}"]["fc2"]["kernel"],
              t_sd[f"film_generator.generators.{i}.block.3.weight"].grad.T)

    # set encoder first conv (flax kernel HWIO <- torch OIHW)
    close(grads["set_encoder"]["conv1"]["kernel"],
          t_sd["set_encoder.encoder.layer1.0.weight"].grad.permute(2, 3, 1, 0))
    # versa hyper-net linears
    for proc in ("weight_processor", "bias_processor"):
        close(grads["versa"][proc]["linear1"]["kernel"],
              t_sd[f"classifier.{proc}.linear1.weight"].grad.T)
    # frozen extractor: exactly zero gradient
    assert all(float(jnp.abs(g).max()) == 0.0
               for g in jax.tree_util.tree_leaves(grads["extractor"]))


def test_cnaps_full_pipeline_matches_torch():
    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0", adapt_features=True,
        classifier="versa", batch_size=64)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=64)
    sd = fake_reference_checkpoint(rec)
    # distinctive-but-small regularisers (the marker values i in the fixture
    # are too large for a numerically stable forward)
    for k in list(sd):
        if k.startswith("film_generator.regularizers."):
            sd[k] = np.full_like(sd[k], 0.01)
    converted = convert_recogniser_checkpoint(sd, rec, variables)

    rng = np.random.default_rng(0)
    way, n_ctx, n_q = 3, 9, 6
    ctx = rng.standard_normal((n_ctx, 64, 64, 3)).astype(np.float32)
    labels = (np.arange(n_ctx) % way).astype(np.int32)
    query = rng.standard_normal((n_q, 64, 64, 3)).astype(np.float32)

    theirs = torch_cnaps_personalise_predict(
        sd, rec, torch.as_tensor(ctx).permute(0, 3, 1, 2), labels, way,
        torch.as_tensor(query).permute(0, 3, 1, 2)).numpy()

    state = rec.personalise(converted, jnp.asarray(ctx[:, None]),
                            jnp.asarray(labels), jnp.ones((n_ctx,), jnp.float32),
                            16)
    ours = np.asarray(rec.predict(converted, state, jnp.asarray(query[:, None]),
                                  class_mask=jnp.asarray((np.arange(16) < way),
                                                         jnp.float32)))
    np.testing.assert_allclose(ours[:, :way], theirs, rtol=2e-3, atol=2e-3)
    assert (ours[:, way:] < -1e29).all()
