"""Gradient correctness of every classifier head via finite differences.

SimpleCNAPs/ProtoNets meta-training backpropagates THROUGH the head
configure+predict pipeline (reference: single-step-learner.py:196-210), so
the heads' backward passes must be finite and correct — including the edge
cases that historically NaN (zero-norm prototypes under proto_cosine: the
clamp must sit INSIDE the sqrt; singular-ish covariances under mahalanobis).
``jax.test_util.check_grads`` compares JAX AD against numerical
differentiation.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.test_util import check_grads

from orbit_tpu.models import heads as heads_lib
from orbit_tpu.utils.optim import cross_entropy

N, D, C, WAY, Q = 10, 16, 8, 3, 6


def setup(seed=0, zero_class=False):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((N, D)).astype(np.float32)
    labels = (np.arange(N) % WAY).astype(np.int32)
    if zero_class:
        feats[labels == 0] = 0.0  # zero-norm prototype edge case
    mask = np.ones((N,), np.float32)
    mask[-2:] = 0.0               # padded context rows
    q = rng.standard_normal((Q, D)).astype(np.float32)
    q_labels = (np.arange(Q) % WAY).astype(np.int32)
    class_mask = (np.arange(C) < WAY).astype(np.float32)
    return (jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(mask),
            jnp.asarray(q), jnp.asarray(q_labels), jnp.asarray(class_mask))


def head_loss(name, logit_scale=1.0, zero_class=False):
    feats, labels, mask, q, q_labels, class_mask = setup(zero_class=zero_class)

    def loss(feats, q):
        head = heads_lib.CONFIGURE[name](feats, labels, mask, C)
        logits = heads_lib.PREDICT[name](head, q, logit_scale=logit_scale,
                                         class_mask=class_mask)
        return cross_entropy(logits, q_labels)

    return loss, (feats, q)


@pytest.mark.parametrize("name", ["proto", "proto_cosine", "mahalanobis"])
def test_head_gradients_match_finite_differences(name):
    loss, args = head_loss(name, logit_scale=16.0 if name == "proto_cosine" else 1.0)
    assert np.isfinite(float(loss(*args)))
    check_grads(loss, args, order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_proto_cosine_zero_prototype_gradient_finite():
    """At an exactly-zero prototype the cosine normalisation is
    non-differentiable; the clamp-inside-sqrt formulation must yield a
    FINITE (steep, ~1/sqrt(eps)) gradient — the same behaviour as torch
    F.normalize at zero — never NaN. Finite differences are meaningless at
    the kink, so only finiteness is asserted."""
    loss, args = head_loss("proto_cosine", logit_scale=16.0, zero_class=True)
    assert np.isfinite(float(loss(*args)))
    grads = jax.grad(loss, argnums=(0, 1))(*args)
    for g in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.isfinite(g).all())


def test_versa_gradients_match_finite_differences():
    from orbit_tpu.models.heads import VersaProcessors, configure_versa

    feats, labels, mask, q, q_labels, class_mask = setup()
    proc = VersaProcessors(feat_dim=D)
    params = proc.init(jax.random.PRNGKey(0), jnp.zeros((2, D)))

    def loss(params, feats, q):
        head = configure_versa(proc, params, feats, labels, mask, C)
        logits = heads_lib.predict_linear(head, q, class_mask=class_mask)
        return cross_entropy(logits, q_labels)

    assert np.isfinite(float(loss(params, feats, q)))
    check_grads(loss, (params, feats, q), order=1, modes=["rev"],
                atol=1e-2, rtol=1e-2)
