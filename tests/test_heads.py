"""Classifier-head math vs naive per-class loop implementations
(reference semantics: model/classifier_heads.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit_tpu.models import heads


def _episode(n=20, d=16, c=4, n_pad=6, c_pad=2, seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(n + n_pad, d).astype(np.float32)
    labels = rng.randint(0, c, size=n + n_pad).astype(np.int64)
    labels[:c] = np.arange(c)  # every class has >= 1 sample
    mask = np.ones(n + n_pad, np.float32)
    mask[n:] = 0.0
    class_mask = np.ones(c + c_pad, np.float32)
    class_mask[c:] = 0.0
    return feats, labels, mask, c + c_pad, class_mask, c


def _naive_means(feats, labels, mask, num_classes):
    means = np.zeros((num_classes, feats.shape[1]), np.float32)
    for cls in range(num_classes):
        sel = (labels == cls) & (mask > 0)
        if sel.sum():
            means[cls] = feats[sel].mean(axis=0)
    return means


def test_masked_class_stats_match_naive():
    feats, labels, mask, C, _, c_real = _episode()
    _, counts, means = heads.masked_class_stats(jnp.array(feats), jnp.array(labels), jnp.array(mask), C)
    np.testing.assert_allclose(np.asarray(means), _naive_means(feats, labels, mask, C), rtol=1e-5)
    for cls in range(C):
        assert counts[cls] == ((labels == cls) & (mask > 0)).sum()


def test_proto_head_matches_reference_math():
    feats, labels, mask, C, class_mask, c_real = _episode()
    head = heads.configure_proto(jnp.array(feats), jnp.array(labels), jnp.array(mask), C)
    means = _naive_means(feats, labels, mask, C)
    np.testing.assert_allclose(np.asarray(head["weight"]), 2 * means, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(head["bias"]), -(means ** 2).sum(1), rtol=1e-4)

    # logits == -squared euclidean distance + constant per row (ProtoNets eq. 8)
    q = np.random.RandomState(1).randn(7, feats.shape[1]).astype(np.float32)
    logits = np.asarray(heads.predict_proto(head, jnp.array(q), class_mask=jnp.array(class_mask)))
    d2 = ((q[:, None, :] - means[None, :, :]) ** 2).sum(-1)
    expected = -d2 + (q ** 2).sum(1, keepdims=True)
    np.testing.assert_allclose(logits[:, :c_real], expected[:, :c_real], rtol=1e-3, atol=1e-3)
    assert (logits[:, c_real:] <= heads.NEG_INF).all()
    # argmax == nearest prototype
    np.testing.assert_array_equal(logits.argmax(1), d2[:, :c_real].argmin(1))


def test_proto_cosine_matches_naive():
    feats, labels, mask, C, class_mask, c_real = _episode(seed=2)
    head = heads.configure_proto_cosine(jnp.array(feats), jnp.array(labels), jnp.array(mask), C)
    q = np.random.RandomState(3).randn(5, feats.shape[1]).astype(np.float32)
    logits = np.asarray(heads.predict_proto_cosine(head, jnp.array(q), logit_scale=32.0,
                                                   class_mask=jnp.array(class_mask)))
    means = _naive_means(feats, labels, mask, C)
    for i in range(5):
        for cls in range(c_real):
            cos = q[i] @ means[cls] / (np.linalg.norm(q[i]) * np.linalg.norm(means[cls]))
            np.testing.assert_allclose(logits[i, cls], 32.0 * cos, rtol=1e-4)


def test_linear_head_zero_init_and_predict():
    head = heads.init_linear_head(3, 8)
    q = jnp.ones((4, 8))
    logits = heads.predict_linear(head, q, logit_scale=2.0)
    np.testing.assert_allclose(np.asarray(logits), 0.0)
    head["weight"] = jnp.ones((3, 8))
    head["bias"] = jnp.arange(3, dtype=jnp.float32)
    logits = np.asarray(heads.predict_linear(head, q, logit_scale=2.0))
    np.testing.assert_allclose(logits, 2.0 * (8.0 + np.arange(3))[None].repeat(4, 0))


def test_versa_head_shapes_and_grads():
    feats, labels, mask, C, class_mask, _ = _episode(d=16)
    proc = heads.VersaProcessors(feat_dim=16)
    params = proc.init(jax.random.PRNGKey(0), jnp.zeros((C, 16)))
    head = heads.configure_versa(proc, params, jnp.array(feats), jnp.array(labels), jnp.array(mask), C)
    assert head["weight"].shape == (C, 16) and head["bias"].shape == (C,)

    def loss(p):
        h = heads.configure_versa(proc, p, jnp.array(feats), jnp.array(labels), jnp.array(mask), C)
        return heads.predict_versa(h, jnp.array(feats[:4])).sum()

    g = jax.grad(loss)(params)
    assert any(np.abs(np.asarray(leaf)).sum() > 0 for leaf in jax.tree_util.tree_leaves(g))


def _naive_mahalanobis(feats, labels, mask, num_classes):
    """Direct transcription of the torch loop (classifier_heads.py:284-326)."""
    valid = mask > 0
    f = feats[valid]
    d = f.shape[1]

    def cov(x):
        if x.shape[0] > 1:
            return np.cov(x.T, ddof=1)
        xc = x[0] - x[0].mean()
        return (xc @ xc) / (d - 1)  # scalar

    task_cov = cov(f)
    means, precisions = [], []
    for cls in range(num_classes):
        sel = valid & (labels == cls)
        cf = feats[sel] if sel.sum() else np.zeros((1, d), np.float32)
        means.append(cf.mean(0))
        lam = cf.shape[0] / (cf.shape[0] + 1)
        cmat = lam * cov(cf) + (1 - lam) * task_cov + np.eye(d)
        precisions.append(np.linalg.inv(cmat))
    return np.stack(means), np.stack(precisions)


def test_mahalanobis_matches_naive():
    feats, labels, mask, C, class_mask, c_real = _episode(n=30, d=8, c=3, seed=4)
    head = heads.configure_mahalanobis(jnp.array(feats), jnp.array(labels), jnp.array(mask), C)
    means, precisions = _naive_mahalanobis(feats, labels, mask, c_real)
    np.testing.assert_allclose(np.asarray(head["means"])[:c_real], means, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(head["precisions"])[:c_real], precisions, rtol=1e-3, atol=1e-4)

    q = np.random.RandomState(5).randn(6, 8).astype(np.float32)
    logits = np.asarray(heads.predict_mahalanobis(head, jnp.array(q), class_mask=jnp.array(class_mask)))
    for i in range(6):
        for cls in range(c_real):
            diff = means[cls] - q[i]
            np.testing.assert_allclose(logits[i, cls], -(diff @ precisions[cls] @ diff), rtol=1e-3, atol=1e-3)
    assert (logits[:, c_real:] <= heads.NEG_INF).all()


def test_mahalanobis_single_sample_class():
    """A class with exactly one context sample triggers the reference's scalar
    covariance fallback (classifier_heads.py:356-361)."""
    rng = np.random.RandomState(6)
    feats = rng.randn(5, 8).astype(np.float32)
    labels = np.array([0, 0, 0, 0, 1], np.int64)  # class 1 has one sample
    mask = np.ones(5, np.float32)
    head = heads.configure_mahalanobis(jnp.array(feats), jnp.array(labels), jnp.array(mask), 2)
    means, precisions = _naive_mahalanobis(feats, labels, mask, 2)
    np.testing.assert_allclose(np.asarray(head["precisions"]), precisions, rtol=1e-3, atol=1e-4)


def test_heads_are_jittable():
    feats, labels, mask, C, class_mask, _ = _episode()
    f, l, m = jnp.array(feats), jnp.array(labels), jnp.array(mask)
    for name in ("proto", "proto_cosine", "mahalanobis"):
        cfg = jax.jit(heads.CONFIGURE[name], static_argnums=3)
        head = cfg(f, l, m, C)
        out = jax.jit(heads.PREDICT[name])(head, f[:3])
        assert out.shape == (3, C)
