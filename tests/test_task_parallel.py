"""Task-level eval parallelism (orbit_tpu/parallel/task_dp.py).

The CLU-VE outer loop (users x tasks, each personalise+predict independent —
reference: single-step-learner.py:314-357) runs one task per mesh lane under
``--task_parallel``. These tests pin (a) lane-local logits == the serial
personalise+predict per task, including dummy fill lanes and ragged video
counts, and (b) driver-level results.json identical to the serial loop.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit_tpu.data.episodes import Episode, pad_rows
from orbit_tpu.learners.steps import build_eval_fns
from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser
from orbit_tpu.parallel import TaskParallelEval, make_mesh
from orbit_tpu.parallel.task_dp import build_query_block, stack_eval_group


def _episode(rng, way, n_ctx, videos, size=32):
    """Test-mode episode: per-video frame stacks of varying lengths."""
    ctx = rng.standard_normal((n_ctx, 1, size, size, 3)).astype(np.float32)
    labels = (np.arange(n_ctx) % way).astype(np.int32)
    frames = [rng.standard_normal((f, size, size, 3)).astype(np.float32)
              for f in videos]
    f_b = 8  # pad every video to a tiny common frame bucket
    return Episode(
        context_clips=ctx, context_labels=labels,
        context_mask=np.ones(n_ctx, np.float32),
        num_classes=16,
        class_mask=(np.arange(16) < way).astype(np.float32),
        way=way,
        video_frames=[pad_rows(f, f_b) for f in frames],
        video_masks=[pad_rows(np.ones(f.shape[0], np.float32), f_b)
                     for f in frames],
        video_labels=[int(i % way) for i in range(len(videos))],
        video_paths=[np.array([f"v{i}/f{j}" for j in range(f_b)])
                     for i in range(len(videos))],
    )


def test_task_parallel_matches_serial_per_task():
    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0", classifier="proto",
        batch_size=16)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=32)
    personalise, predict = build_eval_fns(rec)

    rng = np.random.default_rng(3)
    # 3 real tasks, group of 4 lanes -> one duplicate fill lane; ragged
    # video counts (3/3/4, all bucketing to 4) exercise the video-count
    # bucket padding
    eps = [_episode(rng, way=3, n_ctx=8, videos=[5, 8, 3]),
           _episode(rng, way=3, n_ctx=8, videos=[8, 2, 6]),
           _episode(rng, way=3, n_ctx=8, videos=[4, 4, 4, 6])]
    qbs = [build_query_block(e, clip_length=1) for e in eps]
    assert {q.clips.shape for q in qbs} == {qbs[0].clips.shape}

    tpe = TaskParallelEval(rec, mesh=make_mesh(4))
    batch = stack_eval_group(eps, qbs, 4)
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    states = tpe.personalise(rec_variables := variables, dev)
    logits = np.asarray(tpe.predict(variables, states,
                                    dev["query_clips"], dev["class_mask"]))

    for i, (ep, qb) in enumerate(zip(eps, qbs)):
        state = personalise(variables, jnp.asarray(ep.context_clips),
                            jnp.asarray(ep.context_labels),
                            jnp.asarray(ep.context_mask),
                            jnp.asarray(ep.class_mask))
        lane = logits[i].reshape(qb.video_bucket, qb.frame_bucket, -1)
        for vi, frames in enumerate(ep.video_frames):
            ref = np.asarray(predict(variables, state,
                                     jnp.asarray(frames[:, None]),
                                     jnp.asarray(ep.class_mask)))
            n_fr = qb.n_frames[vi]
            np.testing.assert_allclose(lane[vi][:n_fr], ref[:n_fr],
                                       rtol=2e-4, atol=2e-4)


def test_driver_results_json_identical_to_serial(orbit_fixture_tree,
                                                 tmp_path_factory):
    """--task_parallel 2 end to end: evaluator order, rollups and
    results.json match the serial protocol exactly."""
    from tests.test_learners import make_args
    from orbit_tpu.learners import SingleStepLearner

    root = tmp_path_factory.mktemp("root")
    src = os.path.realpath(orbit_fixture_tree)
    for mode in ("train", "validation", "test"):
        os.symlink(src, root / mode)

    results = {}
    for label, tp in (("serial", 1), ("taskdp", 2)):
        args = make_args(str(root), str(tmp_path_factory.mktemp("ck")),
                         mode="test", task_parallel=tp, num_test_tasks=2)
        learner = SingleStepLearner(args)
        learner.run()
        with open(learner.test_evaluator.json_results_path) as f:
            results[label] = json.load(f)

    assert results["taskdp"] == results["serial"]


@pytest.mark.parametrize("adapt_features", [False, True])
def test_task_parallel_finetune_matches_serial(adapt_features):
    """FineTuner task-DP: each lane's full inner gradient loop (task_params
    AND query logits) must equal the serial FineTuner's for its task —
    including a duplicate fill lane. Covers both inner-loop code paths:
    frozen-backbone head finetuning and FiLM finetuning (the vary_axis
    pcast guards the scan carries in both)."""
    from tests.test_finetune_dp import make_args as make_ft_args
    from orbit_tpu.learners.multi_step import build_finetune_fns
    from orbit_tpu.models.recognisers import MultiStepFewShotRecogniser
    from orbit_tpu.parallel import TaskParallelFineTune

    args = make_ft_args(adapt_features, steps=2, batch_size=6)
    rec = MultiStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0", classifier="linear",
        adapt_features=adapt_features, batch_size=args.batch_size)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=32)

    rng = np.random.default_rng(5)
    # 3 real tasks on 4 lanes -> one duplicate fill lane
    eps = [_episode(rng, way=3, n_ctx=8, videos=[5, 3]),
           _episode(rng, way=3, n_ctx=8, videos=[4, 6]),
           _episode(rng, way=3, n_ctx=8, videos=[2, 8])]
    qbs = [build_query_block(e, clip_length=1) for e in eps]

    tpf = TaskParallelFineTune(rec, args, mesh=make_mesh(4))
    batch = {k: jnp.asarray(v)
             for k, v in stack_eval_group(eps, qbs, 4).items()}
    tps = tpf.personalise(variables, batch)
    logits = np.asarray(tpf.predict(variables, tps, batch["query_clips"],
                                    batch["class_mask"]))

    personalise, predict = build_finetune_fns(rec, args)
    for i, (ep, qb) in enumerate(zip(eps, qbs)):
        ref_tp = personalise(variables, jnp.asarray(ep.context_clips),
                             jnp.asarray(ep.context_labels),
                             jnp.asarray(ep.context_mask),
                             jnp.asarray(ep.class_mask))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a)[i], np.asarray(b), rtol=2e-4, atol=2e-5),
            tps, ref_tp)
        lane = logits[i].reshape(qb.video_bucket, qb.frame_bucket, -1)
        for vi, frames in enumerate(ep.video_frames):
            ref = np.asarray(predict(variables, ref_tp,
                                     jnp.asarray(frames[:, None]),
                                     jnp.asarray(ep.class_mask)))
            n_fr = qb.n_frames[vi]
            np.testing.assert_allclose(lane[vi][:n_fr], ref[:n_fr],
                                       rtol=2e-4, atol=2e-4)


def test_finetuner_driver_results_json_identical_to_serial(
        orbit_fixture_tree, tmp_path_factory):
    """FineTuner --task_parallel 2 end to end: evaluator order, rollups and
    results.json match the serial multi-step protocol exactly."""
    from tests.test_learners import make_args
    from orbit_tpu.learners import MultiStepLearner

    root = tmp_path_factory.mktemp("root")
    src = os.path.realpath(orbit_fixture_tree)
    for mode in ("train", "validation", "test"):
        os.symlink(src, root / mode)

    results = {}
    for label, tp in (("serial", 1), ("taskdp", 2)):
        args = make_args(str(root), str(tmp_path_factory.mktemp("ck")),
                         mode="test", learner="multi-step-learner",
                         classifier="linear", personalize_num_grad_steps=2,
                         personalize_learning_rate=0.1, task_parallel=tp,
                         num_test_tasks=2)
        learner = MultiStepLearner(args)
        learner.run()
        with open(learner.test_evaluator.json_results_path) as f:
            results[label] = json.load(f)

    assert results["taskdp"] == results["serial"]


def test_task_parallel_finetune_mixed_way_lanes():
    """Lanes in one group may carry different real ways (2/3/4) under the
    shared padded class bucket — each lane's head must train against its
    own class_mask, not a group-wide one."""
    from tests.test_finetune_dp import make_args as make_ft_args
    from orbit_tpu.learners.multi_step import build_finetune_fns
    from orbit_tpu.models.recognisers import MultiStepFewShotRecogniser
    from orbit_tpu.parallel import TaskParallelFineTune

    args = make_ft_args(False, steps=2, batch_size=6)
    rec = MultiStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0", classifier="linear",
        adapt_features=False, batch_size=args.batch_size)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=32)

    rng = np.random.default_rng(11)
    eps = [_episode(rng, way=w, n_ctx=8, videos=[4, 6]) for w in (2, 3, 4)]
    qbs = [build_query_block(e, clip_length=1) for e in eps]

    tpf = TaskParallelFineTune(rec, args, mesh=make_mesh(4))
    batch = {k: jnp.asarray(v)
             for k, v in stack_eval_group(eps, qbs, 4).items()}
    tps = tpf.personalise(variables, batch)
    logits = np.asarray(tpf.predict(variables, tps, batch["query_clips"],
                                    batch["class_mask"]))

    personalise, predict = build_finetune_fns(rec, args)
    for i, (ep, qb) in enumerate(zip(eps, qbs)):
        ref_tp = personalise(variables, jnp.asarray(ep.context_clips),
                             jnp.asarray(ep.context_labels),
                             jnp.asarray(ep.context_mask),
                             jnp.asarray(ep.class_mask))
        lane = logits[i].reshape(qb.video_bucket, qb.frame_bucket, -1)
        for vi, frames in enumerate(ep.video_frames):
            ref = np.asarray(predict(variables, ref_tp,
                                     jnp.asarray(frames[:, None]),
                                     jnp.asarray(ep.class_mask)))
            n_fr = qb.n_frames[vi]
            np.testing.assert_allclose(lane[vi][:n_fr], ref[:n_fr],
                                       rtol=2e-4, atol=2e-4)
            # padded classes stay masked out per lane
            way = ep.way
            assert (lane[vi][:n_fr, way:] < -1e20).all()


# ---------------------------------------------------------------- vmap ----
# Single-DEVICE task grouping (TaskBatchedEval / TaskBatchedFineTune): the
# same group assembly runs as one vmapped dispatch on one chip — the
# `--task_parallel N`-on-one-device path (round-5 verdict item 4).


def test_task_batched_eval_matches_serial_per_task():
    from orbit_tpu.parallel import TaskBatchedEval

    rec = SingleStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0", classifier="proto",
        batch_size=16)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=32)
    personalise, predict = build_eval_fns(rec)

    rng = np.random.default_rng(7)
    eps = [_episode(rng, way=3, n_ctx=8, videos=[5, 8, 3]),
           _episode(rng, way=3, n_ctx=8, videos=[8, 2, 6]),
           _episode(rng, way=3, n_ctx=8, videos=[4, 4, 4, 6])]
    qbs = [build_query_block(e, clip_length=1) for e in eps]

    tbe = TaskBatchedEval(rec, dp=4)  # one duplicate fill lane
    batch = {k: jnp.asarray(v)
             for k, v in stack_eval_group(eps, qbs, 4).items()}
    states = tbe.personalise(variables, batch)
    logits = np.asarray(tbe.predict(variables, states,
                                    batch["query_clips"],
                                    batch["class_mask"]))

    for i, (ep, qb) in enumerate(zip(eps, qbs)):
        state = personalise(variables, jnp.asarray(ep.context_clips),
                            jnp.asarray(ep.context_labels),
                            jnp.asarray(ep.context_mask),
                            jnp.asarray(ep.class_mask))
        lane = logits[i].reshape(qb.video_bucket, qb.frame_bucket, -1)
        for vi, frames in enumerate(ep.video_frames):
            ref = np.asarray(predict(variables, state,
                                     jnp.asarray(frames[:, None]),
                                     jnp.asarray(ep.class_mask)))
            n_fr = qb.n_frames[vi]
            np.testing.assert_allclose(lane[vi][:n_fr], ref[:n_fr],
                                       rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("adapt_features", [False, True])
def test_task_batched_finetune_matches_serial(adapt_features):
    """Vmapped FineTuner grouping: each lane's full inner gradient loop and
    query logits equal the serial FineTuner's (both head-only and FiLM
    inner loops; no vary_axis plumbing — plain vmap)."""
    from tests.test_finetune_dp import make_args as make_ft_args
    from orbit_tpu.learners.multi_step import build_finetune_fns
    from orbit_tpu.models.recognisers import MultiStepFewShotRecogniser
    from orbit_tpu.parallel import TaskBatchedFineTune

    args = make_ft_args(adapt_features, steps=2, batch_size=6)
    rec = MultiStepFewShotRecogniser(
        feature_extractor_name="efficientnet_b0", classifier="linear",
        adapt_features=adapt_features, batch_size=args.batch_size)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=32)

    rng = np.random.default_rng(9)
    eps = [_episode(rng, way=3, n_ctx=8, videos=[5, 3]),
           _episode(rng, way=3, n_ctx=8, videos=[4, 6]),
           _episode(rng, way=3, n_ctx=8, videos=[2, 8])]
    qbs = [build_query_block(e, clip_length=1) for e in eps]

    tbf = TaskBatchedFineTune(rec, args, dp=4)
    batch = {k: jnp.asarray(v)
             for k, v in stack_eval_group(eps, qbs, 4).items()}
    tps = tbf.personalise(variables, batch)
    logits = np.asarray(tbf.predict(variables, tps, batch["query_clips"],
                                    batch["class_mask"]))

    personalise, predict = build_finetune_fns(rec, args)
    for i, (ep, qb) in enumerate(zip(eps, qbs)):
        ref_tp = personalise(variables, jnp.asarray(ep.context_clips),
                             jnp.asarray(ep.context_labels),
                             jnp.asarray(ep.context_mask),
                             jnp.asarray(ep.class_mask))
        lane = logits[i].reshape(qb.video_bucket, qb.frame_bucket, -1)
        for vi, frames in enumerate(ep.video_frames):
            ref = np.asarray(predict(variables, ref_tp,
                                     jnp.asarray(frames[:, None]),
                                     jnp.asarray(ep.class_mask)))
            n_fr = qb.n_frames[vi]
            np.testing.assert_allclose(lane[vi][:n_fr], ref[:n_fr],
                                       rtol=2e-4, atol=2e-4)


def test_driver_single_device_batched_results_identical(orbit_fixture_tree,
                                                        tmp_path_factory,
                                                        monkeypatch):
    """--task_parallel 2 with ONE visible device takes the vmap-batched
    path (not silent degrade) and produces results.json identical to the
    serial protocol."""
    from tests.test_learners import make_args
    from orbit_tpu.learners import SingleStepLearner

    root = tmp_path_factory.mktemp("root")
    src = os.path.realpath(orbit_fixture_tree)
    for mode in ("train", "validation", "test"):
        os.symlink(src, root / mode)

    results = {}
    for label, tp in (("serial", 1), ("batched", 2)):
        if label == "batched":
            one = jax.devices()[:1]
            monkeypatch.setattr(jax, "devices", lambda *a, **k: one)
        args = make_args(str(root), str(tmp_path_factory.mktemp("ck")),
                         mode="test", task_parallel=tp, num_test_tasks=2)
        learner = SingleStepLearner(args)
        learner.run()
        with open(learner.test_evaluator.json_results_path) as f:
            results[label] = json.load(f)

    assert results["batched"] == results["serial"]
