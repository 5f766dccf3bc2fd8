"""Per-task classifier heads as fused, masked, jittable functions.

Reference behaviour: model/classifier_heads.py — every head exposes
``configure(context_features, context_labels) -> per-task (weight, bias)`` then
``predict(features) -> logits``. The reference loops over classes in Python;
here each configure is a single batched computation (one-hot matmuls on the
MXU, batched matrix inverse for Mahalanobis) over **fixed-shape padded
episodes**: a ``sample_mask (N,)`` marks valid context rows and a
``class_mask (C,)`` marks real classes; padded classes get ``-inf`` logits so
softmax/argmax/CE ignore them.

Heads:
- linear       (classifier_heads.py:38-79)   zero-init, finetuned per task
- versa        (classifier_heads.py:121-180) hyper-net generated linear layer
- proto        (classifier_heads.py:182-263) ProtoNets eq. 8: w=2mu, b=-|mu|^2
- proto_cosine (classifier_heads.py:214-217) cosine similarity to prototypes
- mahalanobis  (classifier_heads.py:265-368) SimpleCNAPs class-precision
                distance, lambda = n/(n+1) blend of class and task covariance

All head math runs in float32 regardless of the backbone compute dtype
(SURVEY.md §7 hard part 6: covariance/inverse need f32 under bf16 matmuls).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from orbit_tpu.models.mlps import DenseResidualBlock

NEG_INF = -1e30


def masked_class_stats(features: jnp.ndarray, labels: jnp.ndarray,
                       sample_mask: jnp.ndarray, num_classes: int):
    """Per-class counts and means via one-hot matmul (MXU-friendly
    replacement for the reference's per-class gather loop,
    classifier_heads.py:94-105).

    Returns (one_hot (N, C), counts (C,), means (C, D)) in float32.
    """
    features = features.astype(jnp.float32)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    one_hot = one_hot * sample_mask.astype(jnp.float32)[:, None]
    counts = one_hot.sum(axis=0)
    sums = one_hot.T @ features
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    return one_hot, counts, means


def _mask_logits(logits: jnp.ndarray, class_mask: Optional[jnp.ndarray]):
    if class_mask is None:
        return logits
    return jnp.where(class_mask.astype(bool)[None, :], logits, NEG_INF)


# ---------------------------------------------------------------- linear ----
def init_linear_head(num_classes: int, feat_dim: int) -> Dict[str, jnp.ndarray]:
    """Zero-init per-task linear layer (reference: classifier_heads.py:53-60)."""
    return {
        "weight": jnp.zeros((num_classes, feat_dim), jnp.float32),
        "bias": jnp.zeros((num_classes,), jnp.float32),
    }


def predict_linear(head: Dict[str, jnp.ndarray], features: jnp.ndarray,
                   logit_scale: float = 1.0,
                   class_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    logits = logit_scale * (features.astype(jnp.float32) @ head["weight"].T + head["bias"])
    return _mask_logits(logits, class_mask)


# ----------------------------------------------------------------- proto ----
def configure_proto(features: jnp.ndarray, labels: jnp.ndarray,
                    sample_mask: jnp.ndarray, num_classes: int) -> Dict[str, jnp.ndarray]:
    """ProtoNets euclidean head: weight = 2*prototype, bias = -|prototype|^2
    (reference: classifier_heads.py:232-263, eq. 8 of the ProtoNets paper)."""
    _, counts, means = masked_class_stats(features, labels, sample_mask, num_classes)
    return {
        "weight": 2.0 * means,
        "bias": -jnp.sum(means * means, axis=1),
        "counts": counts,
    }


def predict_proto(head: Dict[str, jnp.ndarray], features: jnp.ndarray,
                  logit_scale: float = 1.0,
                  class_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    logits = logit_scale * (features.astype(jnp.float32) @ head["weight"].T + head["bias"])
    return _mask_logits(logits, class_mask)


def configure_proto_cosine(features: jnp.ndarray, labels: jnp.ndarray,
                           sample_mask: jnp.ndarray, num_classes: int) -> Dict[str, jnp.ndarray]:
    """Cosine head stores the prototypes; the reference stores 2*prototype but
    cosine similarity is scale-invariant (classifier_heads.py:250-263,214-217)."""
    _, counts, means = masked_class_stats(features, labels, sample_mask, num_classes)
    return {"weight": means, "counts": counts}


def predict_proto_cosine(head: Dict[str, jnp.ndarray], features: jnp.ndarray,
                         logit_scale: float = 1.0,
                         class_mask: Optional[jnp.ndarray] = None,
                         eps: float = 1e-8) -> jnp.ndarray:
    f = features.astype(jnp.float32)
    w = head["weight"]
    # torch.cosine_similarity clamps each norm at eps. The clamp must sit
    # INSIDE the sqrt: sqrt's gradient at an all-zero row (padded classes'
    # prototypes are exactly 0) is 0/0 = NaN, and 0 * NaN from the clamp's
    # select still poisons the backward pass.
    f_norm = jnp.sqrt(jnp.maximum(jnp.sum(f * f, axis=1, keepdims=True), eps * eps))
    w_norm = jnp.sqrt(jnp.maximum(jnp.sum(w * w, axis=1, keepdims=True), eps * eps))
    logits = logit_scale * ((f / f_norm) @ (w / w_norm).T)
    return _mask_logits(logits, class_mask)


# ----------------------------------------------------------------- versa ----
class VersaProcessors(nn.Module):
    """Meta-trained hyper-networks generating the linear layer from class means
    (reference: classifier_heads.py:121-143; DenseResidualBlock mlps.py:33-50)."""

    feat_dim: int

    @nn.compact
    def __call__(self, class_means: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        weight = DenseResidualBlock(self.feat_dim, name="weight_processor")(class_means)
        bias = DenseResidualBlock(1, name="bias_processor")(class_means)
        return weight, bias.reshape(-1)


def configure_versa(processors: VersaProcessors, processor_params,
                    features: jnp.ndarray, labels: jnp.ndarray,
                    sample_mask: jnp.ndarray, num_classes: int) -> Dict[str, jnp.ndarray]:
    _, counts, means = masked_class_stats(features, labels, sample_mask, num_classes)
    weight, bias = processors.apply(processor_params, means)
    return {"weight": weight, "bias": bias, "counts": counts}


predict_versa = predict_linear  # same linear logits path (classifier_heads.py:145-151)


# ----------------------------------------------------------- mahalanobis ----
def _masked_cov(features: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Unbiased covariance over masked rows (torch.cov correction=1,
    reference: classifier_heads.py:349-368). Returns (D, D) float32."""
    f = features.astype(jnp.float32)
    m = mask.astype(jnp.float32)[:, None]
    n = jnp.maximum(m.sum(), 1.0)
    mean = (f * m).sum(axis=0, keepdims=True) / n
    centered = (f - mean) * m
    return centered.T @ centered / jnp.maximum(n - 1.0, 1.0)


def _single_sample_cov_scalar(features: jnp.ndarray, one_hot_col: jnp.ndarray) -> jnp.ndarray:
    """The reference's n==1 fallback (classifier_heads.py:358-361): treat the
    single D-vector as D observations; returns a scalar broadcast over (D,D)."""
    f = features.astype(jnp.float32)
    d = f.shape[1]
    x = (one_hot_col[:, None] * f).sum(axis=0)          # the single row
    xc = x - x.mean()
    return (xc @ xc) / (d - 1)


def configure_mahalanobis(features: jnp.ndarray, labels: jnp.ndarray,
                          sample_mask: jnp.ndarray, num_classes: int) -> Dict[str, jnp.ndarray]:
    """SimpleCNAPs head (reference: classifier_heads.py:284-326):
    per-class precision = inv(lambda_k*class_cov + (1-lambda_k)*task_cov + I),
    lambda_k = n_k / (n_k + 1); single-sample classes fall back to the
    reference's scalar covariance estimate. Inverse via an MXU-batched solve
    in float32.
    """
    f = features.astype(jnp.float32)
    d = f.shape[1]
    one_hot, counts, means = masked_class_stats(f, labels, sample_mask, num_classes)
    task_cov = _masked_cov(f, sample_mask)
    eye = jnp.eye(d, dtype=jnp.float32)
    task_precision = jnp.linalg.inv(task_cov + eye)
    task_mean = (f * sample_mask.astype(jnp.float32)[:, None]).sum(axis=0) / jnp.maximum(
        sample_mask.astype(jnp.float32).sum(), 1.0)

    def per_class(one_hot_col, mean, count):
        n = jnp.maximum(count, 1.0)
        centered = (f - mean[None, :]) * one_hot_col[:, None]
        cov_nd = centered.T @ centered / jnp.maximum(count - 1.0, 1.0)
        cov_1d = _single_sample_cov_scalar(f, one_hot_col)      # scalar
        class_cov = jnp.where(count > 1.0, cov_nd, cov_1d)      # broadcast on n==1
        lam = n / (n + 1.0)
        cov = lam * class_cov + (1.0 - lam) * task_cov + eye
        return jnp.linalg.inv(cov)

    precisions = jax.vmap(per_class, in_axes=(1, 0, 0))(one_hot, means, counts)
    return {
        "means": means, "precisions": precisions, "counts": counts,
        "task_mean": task_mean, "task_precision": task_precision,
    }


def predict_mahalanobis(head: Dict[str, jnp.ndarray], features: jnp.ndarray,
                        logit_scale: float = 1.0,
                        class_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """logits = -Mahalanobis^2(feature, class distribution)
    (reference: classifier_heads.py:328-347). On TPU this dispatches to the
    fused Pallas kernel (orbit_tpu.ops.mahalanobis) that blocks over classes
    in VMEM instead of materialising the (M, C, D) intermediates."""
    from orbit_tpu.ops import mahalanobis_logits

    return mahalanobis_logits(features, head["means"], head["precisions"],
                              class_mask=class_mask, logit_scale=logit_scale)


# -------------------------------------------------------------- dispatch ----
CONFIGURE = {
    "proto": configure_proto,
    "proto_cosine": configure_proto_cosine,
    "mahalanobis": configure_mahalanobis,
}
PREDICT = {
    "linear": predict_linear,
    "versa": predict_versa,
    "proto": predict_proto,
    "proto_cosine": predict_proto_cosine,
    "mahalanobis": predict_mahalanobis,
}
