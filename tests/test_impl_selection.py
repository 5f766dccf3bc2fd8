"""Batch-size-aware kernel selection for the differentiated train path.

The train steps (learners/steps.py) pick the attention/MLP implementation
for their *differentiated* bodies by dispatch batch size — the fused Pallas
forward+backward kernels at protocol scale (>= PALLAS_BWD_MIN_BATCH), the
XLA reference ops below the measured crossover (PERF.md "ViT train path":
125.5 vs 131.7 ms/task-step at batch 256; 48.6 vs 40.9 at batch 32).

These tests pin (a) the scope helper's thresholds, (b) that an explicit
force_impl override still wins, and (c) that the actual train-step traces
see the selected implementation at the backbone's kernel call sites.
"""
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit_tpu.learners import steps as steps_lib
from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser
from orbit_tpu.ops import tiny_attention as ta


def test_scope_thresholds():
    assert steps_lib.PALLAS_BWD_MIN_BATCH == 64  # measured crossover, PERF.md
    with steps_lib.train_impl_scope(steps_lib.PALLAS_BWD_MIN_BATCH - 1):
        assert ta._IMPL_OVERRIDE == "xla"
    assert ta._IMPL_OVERRIDE is None
    # at/above the crossover: no override -> module defaults stay in force
    # (fused Pallas fwd+bwd on TPU, XLA elsewhere)
    with steps_lib.train_impl_scope(steps_lib.PALLAS_BWD_MIN_BATCH):
        assert ta._IMPL_OVERRIDE is None
    with steps_lib.train_impl_scope(256):
        assert ta._IMPL_OVERRIDE is None


def test_force_impl_beats_scope():
    """Benchmarks/parity harnesses pin an impl around the whole step; the
    scope must yield to it even below the crossover."""
    with ta.force_impl("pallas"):
        with steps_lib.train_impl_scope(4):
            assert ta._IMPL_OVERRIDE == "pallas"
    assert ta._IMPL_OVERRIDE is None


def _args(batch_size, lite=4):
    return SimpleNamespace(tasks_per_batch=2, learn_extractor=True,
                           with_lite=True, num_lite_samples=lite,
                           batch_size=batch_size, optimizer="adam",
                           learning_rate=1e-3, weight_decay=0.0,
                           betas=(0.9, 0.999), epsilon=1e-8)


def _episode(n=8, way=3, size=64):
    rng = np.random.default_rng(0)
    return {
        "context_clips": jnp.asarray(
            rng.standard_normal((n, 1, size, size, 3)), jnp.float32),
        "context_labels": jnp.asarray(rng.integers(0, way, n), jnp.int32),
        "context_mask": jnp.ones(n, jnp.float32),
        "class_mask": jnp.asarray(np.arange(4) < way, jnp.float32),
        "target_clips": jnp.asarray(
            rng.standard_normal((n, 1, size, size, 3)), jnp.float32),
        "target_labels": jnp.asarray(rng.integers(0, way, n), jnp.int32),
        "target_mask": jnp.ones(n, jnp.float32),
    }


def _trace_overrides(monkeypatch, build, batch_size, n_episode=8):
    """Trace one train step abstractly (eval_shape: no compute) on a small
    ViT and record the impl override in force at every call of the
    backbone's fused attention op."""
    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="vit_s_32", adapt_features=False,
        classifier="proto", batch_size=batch_size, learn_extractor=True,
        num_lite_samples=4)
    var_shapes = jax.eval_shape(lambda k: rec.init(k, frame_size=64),
                                jax.random.PRNGKey(0))

    seen = []
    real = ta.fused_qkv_attention

    def recording(*a, **k):
        seen.append(ta._IMPL_OVERRIDE)
        return real(*a, **k)

    # installed AFTER the init shape-trace so only the step's calls record
    monkeypatch.setattr(ta, "fused_qkv_attention", recording)
    fn = build(rec, _args(batch_size), jit=False)
    jax.eval_shape(fn, var_shapes, _episode(n=n_episode), jax.random.PRNGKey(1))
    assert seen, "the trace never reached the fused attention op"
    return set(seen)


def test_lite_step_selects_by_batch_size(monkeypatch):
    # below the crossover every differentiated trace sees "xla"; the
    # no-grad cache pass stays on the module default (None)
    small = _trace_overrides(monkeypatch, steps_lib.build_train_task_lite, 4)
    assert small == {None, "xla"}
    big = _trace_overrides(monkeypatch, steps_lib.build_train_task_lite, 64,
                           n_episode=64)
    assert big == {None}
    # LITE selects by ACTUAL dispatch rows: a trimmed tail batch below the
    # crossover (8 target rows here) drops to XLA even at a protocol-scale
    # --batch_size (the tail-trim optimisation, steps.py)
    tail = _trace_overrides(monkeypatch, steps_lib.build_train_task_lite, 64,
                            n_episode=8)
    assert tail == {None, "xla"}


def test_nonlite_step_selects_by_batch_size(monkeypatch):
    small = _trace_overrides(monkeypatch, steps_lib.build_train_task, 4)
    assert small == {"xla"}
    big = _trace_overrides(monkeypatch, steps_lib.build_train_task, 64)
    assert big == {None}
