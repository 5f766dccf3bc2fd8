"""uint8 wire format + device-side normalization (round 5).

The loader can ship raw uint8 pixels (data/loader.py ``raw_uint8``) and the
recogniser normalizes on device, keyed on dtype at trace time
(models/recognisers.py ``_maybe_normalize``) — 4x fewer host->device bytes
than float32, 2x fewer than bf16, and a 4x bigger effective --frame_cache.
These tests pin (a) pixel-level parity between the two wire formats at the
loader, (b) logits parity through the recogniser, and (c) driver-level
results.json identity between ``--host_normalize`` and the default.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit_tpu.data.index import NORMALIZE_STATS
from orbit_tpu.data.loader import FrameLoader
from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser


def _frame_paths(tree, n=6):
    paths = []
    for root, _, files in os.walk(tree):
        for f in sorted(files):
            if f.endswith(".jpg"):
                paths.append(os.path.join(root, f))
            if len(paths) >= n:
                return np.asarray(paths)
    return np.asarray(paths)


def test_loader_wire_formats_pixel_parity(orbit_fixture_tree):
    paths = _frame_paths(orbit_fixture_tree)
    f32 = FrameLoader(32, "imagenet", num_threads=2).load_paths(paths)
    u8 = FrameLoader(32, "imagenet", num_threads=2,
                     raw_uint8=True).load_paths(paths)
    assert u8.dtype == np.uint8 and f32.dtype == np.float32
    stats = NORMALIZE_STATS["imagenet"]
    ref = ((u8.astype(np.float32) / 255.0
            - np.asarray(stats["mean"], np.float32))
           / np.asarray(stats["std"], np.float32))
    # the native float path multiplies by 1/std (C++) while the reference
    # formula divides — a ~1-2 ulp difference at |x|~2.6
    np.testing.assert_allclose(ref, f32, atol=1e-6)


def test_loader_raw_cache_roundtrip(orbit_fixture_tree):
    paths = _frame_paths(orbit_fixture_tree)
    loader = FrameLoader(32, "imagenet", num_threads=2, raw_uint8=True)
    loader.enable_cache(64)
    a = loader.load_paths(paths)
    b = loader.load_paths(paths)
    assert loader.cache_stats()[0] >= len(paths)  # second pass hits
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_recogniser_logits_parity_uint8_vs_float(dtype):
    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0", classifier="proto",
        batch_size=8, dtype=dtype, frame_norm_method="imagenet")
    variables = rec.init(jax.random.PRNGKey(0), frame_size=32)

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (6, 1, 32, 32, 3), np.uint8)
    stats = NORMALIZE_STATS["imagenet"]
    f32 = ((u8.astype(np.float32) / 255.0
            - np.asarray(stats["mean"], np.float32))
           / np.asarray(stats["std"], np.float32))
    wire = f32.astype(np.float32 if dtype == jnp.float32 else jnp.bfloat16)
    labels = jnp.asarray([0, 1, 2, 0, 1, 2], jnp.int32)
    mask = jnp.ones(6, jnp.float32)
    cm = jnp.asarray(np.arange(4) < 3, jnp.float32)

    def run(clips):
        state = rec.personalise(variables, clips, labels, mask, 4,
                                train=False, with_grad=False)
        return rec.predict(variables, state, clips, class_mask=cm,
                           train=False, with_grad=False)

    lu = np.asarray(run(jnp.asarray(u8)))
    lf = np.asarray(run(jnp.asarray(wire)))
    # identical math modulo one f32 rounding (host numpy vs device XLA
    # normalize); bf16 wire additionally rounds the normalized value once
    np.testing.assert_allclose(lu, lf, rtol=2e-5, atol=2e-5)


def test_uint8_survives_pad_and_logits_match_host_normalize():
    """The uint8 wire must survive ``pad_episode`` (round-5 review finding:
    an unconditional float32 cast there silently shipped raw 0..255 values
    that nothing ever normalized — the dtype IS the normalize-on-device
    signal, so padding must preserve it end-to-end) and the padded episode's
    logits must match the host-normalized float path on non-trivial pixels."""
    from orbit_tpu.data.episodes import pad_episode
    from orbit_tpu.learners import steps as steps_lib
    from orbit_tpu.learners.single_step import episode_to_train_dict

    rng = np.random.default_rng(0)
    ctx = rng.integers(0, 256, (4, 1, 16, 16, 3), np.uint8)
    tgt = rng.integers(0, 256, (6, 1, 16, 16, 3), np.uint8)
    task_u8 = {
        "context_clips": ctx, "context_labels": np.array([0, 0, 1, 1]),
        "target_clips": tgt, "target_labels": np.array([0, 1, 0, 1, 0, 1]),
    }
    stats = NORMALIZE_STATS["imagenet"]
    mean = np.asarray(stats["mean"], np.float32)
    std = np.asarray(stats["std"], np.float32)
    task_f32 = dict(task_u8,
                    context_clips=(ctx.astype(np.float32) / 255.0 - mean) / std,
                    target_clips=(tgt.astype(np.float32) / 255.0 - mean) / std)

    ep, ep_f = pad_episode(task_u8), pad_episode(task_f32)
    # dtype preserved host-side, and all the way into the device dict
    assert ep.context_clips.dtype == np.uint8
    assert ep.target_clips.dtype == np.uint8
    assert ep_f.context_clips.dtype == np.float32
    dev = episode_to_train_dict(ep)
    assert dev["context_clips"].dtype == jnp.uint8
    assert dev["target_clips"].dtype == jnp.uint8

    # test-mode per-video frames too
    task_test = {
        "context_clips": ctx, "context_labels": np.array([0, 0, 1, 1]),
        "target_clips": [tgt[:, 0]], "target_labels": [1],
        "target_paths": [np.array(["p"] * 6)],
    }
    assert pad_episode(task_test).video_frames[0].dtype == np.uint8

    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0", classifier="proto",
        batch_size=8)
    variables = jax.jit(lambda k: rec.init(k, 16))(jax.random.PRNGKey(0))
    pers, pred = steps_lib.build_eval_fns(rec)

    def logits(e):
        state = pers(variables, jnp.asarray(e.context_clips),
                     jnp.asarray(e.context_labels),
                     jnp.asarray(e.context_mask), jnp.asarray(e.class_mask))
        return pred(variables, state, jnp.asarray(e.target_clips),
                    jnp.asarray(e.class_mask))

    np.testing.assert_allclose(np.asarray(logits(ep)),
                               np.asarray(logits(ep_f)),
                               rtol=2e-5, atol=2e-5)


def test_driver_results_identical_host_vs_device_normalize(
        orbit_fixture_tree, tmp_path_factory):
    from tests.test_learners import make_args
    from orbit_tpu.learners import SingleStepLearner

    root = tmp_path_factory.mktemp("root")
    src = os.path.realpath(orbit_fixture_tree)
    for mode in ("train", "validation", "test"):
        os.symlink(src, root / mode)

    results = {}
    for label, host_norm in (("device", False), ("host", True)):
        args = make_args(str(root), str(tmp_path_factory.mktemp("ck")),
                         mode="test", num_test_tasks=2)
        args.host_normalize = host_norm
        learner = SingleStepLearner(args)
        learner.run()
        with open(learner.test_evaluator.json_results_path) as f:
            results[label] = json.load(f)

    assert results["device"] == results["host"]
