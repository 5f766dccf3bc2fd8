"""Pallas kernel tests (interpret mode on CPU) against the XLA reference
implementations."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orbit_tpu.ops.mahalanobis import mahalanobis_logits


@pytest.mark.parametrize("m,c,d", [(32, 8, 128), (200, 16, 256)])
def test_mahalanobis_kernel_matches_xla(m, c, d):
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((m, d)).astype(np.float32)
    means = rng.standard_normal((c, d)).astype(np.float32)
    # SPD-ish precisions
    a = rng.standard_normal((c, d, d)).astype(np.float32) * 0.05
    precisions = np.einsum("cde,cfe->cdf", a, a) + np.eye(d, dtype=np.float32)
    mask = (np.arange(c) < c - 2).astype(np.float32)

    ref = mahalanobis_logits(jnp.asarray(feats), jnp.asarray(means),
                             jnp.asarray(precisions), jnp.asarray(mask),
                             logit_scale=0.7, force="xla")
    ker = mahalanobis_logits(jnp.asarray(feats), jnp.asarray(means),
                             jnp.asarray(precisions), jnp.asarray(mask),
                             logit_scale=0.7, force="interpret")
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                               rtol=2e-4, atol=2e-3)
    # masked classes are NEG_INF in both
    assert (np.asarray(ker)[:, -2:] < -1e29).all()


def test_mahalanobis_pallas_shard_map_trace():
    """vma contract of the opt-in kernel: mahalanobis_logits(force="pallas")
    must trace through shard_map with a dp-sharded query batch and replicated
    class stats (Mosaic lowering needs a TPU; the strict-vma typing —
    out_struct/align_vma — is checked on any backend). Mirrors
    test_sharded_query_vit_fused_kernels_trace for the attention kernels.
    NB force="interpret" cannot EXECUTE inside shard_map (see the
    mahalanobis_logits docstring) — this pins the trace-level contract the
    real-TPU path relies on."""
    from jax.sharding import PartitionSpec as P

    from orbit_tpu.parallel import make_mesh

    mesh = make_mesh(4)
    m, c, d = 32, 8, 128
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    means = jnp.asarray(rng.standard_normal((c, d)), jnp.float32)
    precisions = jnp.broadcast_to(jnp.eye(d, dtype=jnp.float32), (c, d, d))
    mask = jnp.ones((c,), jnp.float32)

    fn = jax.shard_map(
        lambda f, mu, pr, mk: mahalanobis_logits(f, mu, pr, mk,
                                                 force="pallas"),
        mesh=mesh, in_specs=(P("dp"), P(), P(), P()), out_specs=P("dp"))
    traced = jax.jit(fn).trace(feats, means, precisions, mask)
    assert "pallas_call" in str(traced.jaxpr)


def test_mahalanobis_head_dispatch():
    """predict_mahalanobis routes through the shared kernel entry point and
    stays numerically consistent with configure_mahalanobis output."""
    from orbit_tpu.models import heads as heads_lib

    rng = np.random.default_rng(1)
    n, d, c = 24, 64, 8
    feats = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, size=n), jnp.int32)
    mask = jnp.ones((n,), jnp.float32)
    head = heads_lib.configure_mahalanobis(feats, labels, mask, c)
    logits = heads_lib.predict_mahalanobis(head, feats,
                                           class_mask=jnp.asarray(
                                               (np.arange(c) < 3), jnp.float32))
    assert logits.shape == (n, c)
    preds = np.asarray(logits).argmax(-1)
    acc = (preds == np.asarray(labels)).mean()
    assert acc > 0.5  # own context should mostly classify correctly
