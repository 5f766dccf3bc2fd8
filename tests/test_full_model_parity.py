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
