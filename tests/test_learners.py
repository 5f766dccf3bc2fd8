"""End-to-end learner tests on the synthetic ORBIT fixture tree:
meta-training (with and without LITE), validation/best-tracking, the CLU-VE
test protocol with results.json export, FineTuner personalisation, and
checkpoint resume. (SURVEY.md §4 test plan b/c.)"""
import json
import os
import types

import numpy as np
import pytest


def make_args(data_path, checkpoint_dir, **overrides):
    """Parse the real CLI surface with test-friendly defaults."""
    from orbit_tpu.utils.args import parse_args

    learner = overrides.pop("learner", "single-step-learner")
    argv = ["--data_path", data_path, "--checkpoint_dir", checkpoint_dir]
    flags = {
        "--frame_size": "84",
        "--epochs": "1",
        "--num_train_tasks": "1",
        "--num_val_tasks": "1",
        "--num_test_tasks": "1",
        "--tasks_per_batch": "2",
        "--batch_size": "8",
        "--num_lite_samples": "4",
        "--subsample_factor": "2",
        "--context_shot": "2",
        "--target_shot": "1",
        "--mode": "test",
        # 'random' keeps test videos at ~30 clips (vs random_200's 200) so the
        # CPU suite stays fast; the protocol itself is clip-method agnostic
        "--test_target_clip_method": "random",
        "--classifier": "proto",
        "--feature_extractor": "efficientnet_b0",
        "--learning_rate": "1e-3",
        # keep the suite on the conftest cache dir (learner construction
        # points the global jax compilation cache at --compile_cache)
        "--compile_cache": os.environ.get("JAX_TEST_CACHE",
                                          "/tmp/orbit_tpu_jax_cache"),
    }
    bools, multi = [], []
    for k, v in overrides.items():
        flag = f"--{k}"
        if isinstance(v, bool):
            if v:
                bools.append(flag)
            flags.pop(flag, None)
        elif isinstance(v, (list, tuple)):
            multi.append((flag, [str(x) for x in v]))
        else:
            flags[flag] = str(v)
    for f, v in flags.items():
        argv.extend([f, v])
    for f, vals in multi:
        argv.extend([f, *vals])
    argv.extend(bools)
    # frame_size 84 isn't a reference choice restriction problem: both 84/224 allowed
    return parse_args(learner, argv)


@pytest.fixture(scope="module")
def orbit_root(orbit_fixture_tree, tmp_path_factory):
    """Wrap the mode dir into a full ORBIT root: train/validation/test all
    pointing at the same synthetic user tree."""
    root = tmp_path_factory.mktemp("orbit_root")
    src = os.path.realpath(orbit_fixture_tree)          # .../orbit_data/test
    for mode in ("train", "validation", "test"):
        os.symlink(src, root / mode)
    return str(root)


def test_single_step_test_protocol(orbit_root, tmp_path):
    from orbit_tpu.learners import SingleStepLearner

    args = make_args(orbit_root, str(tmp_path / "ckpt"), mode="test")
    learner = SingleStepLearner(args)
    learner.run()

    # results.json written in challenge format
    results_path = learner.test_evaluator.json_results_path
    with open(results_path) as f:
        results = json.load(f)
    assert set(results.keys()) == {"P001", "P002"}
    for user, tasks in results.items():
        assert len(tasks) == 1  # num_test_tasks=1
        task = tasks[0]
        assert task["task_object_list"]
        assert task["task_macs_to_personalise"] > 0
        for video, frames in task["task_videos"].items():
            assert "clutter" in video
            assert all(isinstance(p, int) for p in frames.values())


def test_single_step_train_no_lite(orbit_root, tmp_path):
    from orbit_tpu.learners import SingleStepLearner

    args = make_args(orbit_root, str(tmp_path / "ckpt"), mode="train",
                     adapt_features=True, classifier="proto")
    learner = SingleStepLearner(args)
    import jax
    # snapshot to host: apply_update DONATES the old param buffers
    # (steps.build_apply_update), so the original device arrays are deleted
    # after the first optimiser step
    before = jax.tree_util.tree_map(
        np.asarray, learner.variables["params"]["film_generator"])
    learner.run()
    after = learner.variables["params"]["film_generator"]
    diffs = jax.tree_util.tree_map(lambda a, b: float(abs(np.asarray(a) - np.asarray(b)).max()),
                                   before, after)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0, "film generator params did not update"
    # final checkpoint written
    assert os.path.exists(learner.checkpoint_path_final)
    assert os.path.exists(os.path.join(learner.checkpoint_dir, "checkpoint.ckpt"))


def test_single_step_train_with_lite(orbit_root, tmp_path):
    from orbit_tpu.learners import SingleStepLearner

    args = make_args(orbit_root, str(tmp_path / "ckpt"), mode="train",
                     adapt_features=True, with_lite=True, classifier="versa")
    learner = SingleStepLearner(args)
    learner.run()
    assert os.path.exists(learner.checkpoint_path_final)
    # train evaluator must have been reset after the epoch
    assert learner.train_evaluator.running_stats["frame_acc"] == []


def test_single_step_resume(orbit_root, tmp_path):
    from orbit_tpu.learners import SingleStepLearner

    args = make_args(orbit_root, str(tmp_path / "ckpt"), mode="train",
                     adapt_features=True)
    learner = SingleStepLearner(args)
    learner.run()
    ckpt = os.path.join(learner.checkpoint_dir, "checkpoint.ckpt")

    args2 = make_args(orbit_root, str(tmp_path / "ckpt2"), mode="train",
                      adapt_features=True, epochs=2, resume_from=ckpt)
    learner2 = SingleStepLearner(args2)
    learner2.run()
    assert learner2.start_epoch == 1  # resumed after epoch 1


def test_single_step_train_data_parallel(orbit_root, tmp_path):
    """--data_parallel 2 routes training through the shard_map episode-DP
    path on the virtual CPU mesh."""
    from orbit_tpu.learners import SingleStepLearner

    args = make_args(orbit_root, str(tmp_path / "ckpt"), mode="train",
                     adapt_features=True, data_parallel=2)
    learner = SingleStepLearner(args)
    learner.run()
    assert os.path.exists(learner.checkpoint_path_final)


def test_single_step_train_lite_data_parallel(orbit_root, tmp_path):
    """--with_lite --data_parallel 2 — the reference's headline training mode
    (LITE) through the shard_map episode-DP path, driver end-to-end (the LITE
    scan carry must be device-varying under shard_map)."""
    from orbit_tpu.learners import SingleStepLearner

    args = make_args(orbit_root, str(tmp_path / "ckpt"), mode="train",
                     adapt_features=True, with_lite=True, learn_extractor=True,
                     data_parallel=2)
    learner = SingleStepLearner(args)
    learner.run()
    assert os.path.exists(learner.checkpoint_path_final)


def test_single_step_clip_length_history(orbit_root, tmp_path):
    """--clip_length 2: multi-frame clips flow through sampling,
    attach_frame_history and the (N, T, H, W, 3) embed path end to end
    (reference trains its LITE models at clip_length 8)."""
    from orbit_tpu.learners import SingleStepLearner

    args = make_args(orbit_root, str(tmp_path / "ckpt"), mode="test",
                     clip_length=2)
    learner = SingleStepLearner(args)
    learner.run()
    assert os.path.exists(learner.test_evaluator.json_results_path)


def test_single_step_bf16_compute(orbit_root, tmp_path):
    """--compute_dtype bfloat16: backbone matmuls in bf16, heads f32."""
    from orbit_tpu.learners import SingleStepLearner

    args = make_args(orbit_root, str(tmp_path / "ckpt"), mode="test",
                     compute_dtype="bfloat16")
    learner = SingleStepLearner(args)
    learner.run()
    assert os.path.exists(learner.test_evaluator.json_results_path)


def test_all_metrics_selectable(orbit_root, tmp_path):
    """--metrics wires video_acc and frames_to_recognition through the full
    CLU-VE protocol (the reference computes but never wires them)."""
    from orbit_tpu.learners import SingleStepLearner

    args = make_args(orbit_root, str(tmp_path / "ckpt"), mode="test",
                     metrics=["frame_acc", "video_acc", "frames_to_recognition"])
    learner = SingleStepLearner(args)
    evaluator = learner.test_evaluator
    learner._run_eval_protocol(learner.test_queue, evaluator,
                               args.num_test_tasks, "test", with_timing=False)
    user_s, _, _, video_s = evaluator.get_mean_stats()
    for stat in ("frame_acc", "video_acc", "frames_to_recognition"):
        assert stat in video_s and 0.0 <= video_s[stat][0] <= 1.0


def test_batched_videos_matches_unbatched(orbit_root, tmp_path):
    """--batch_videos (one dispatch per task) must reproduce the per-video
    predictions of the serial path exactly."""
    import jax
    from orbit_tpu.learners import SingleStepLearner

    outs = []
    for batched in (False, True):
        args = make_args(orbit_root, str(tmp_path / f"ckpt{batched}"), mode="test",
                         test_target_clip_method="random_200",
                         batch_videos=batched)
        learner = SingleStepLearner(args)
        ev = learner.test_evaluator
        learner._run_eval_protocol(learner.test_queue, ev, args.num_test_tasks,
                                   "test", with_timing=False)
        outs.append([np.concatenate([p.reshape(-1) for task in user for p in task])
                     for user in ev.all_frame_probs[:ev.current_user + 1]])
        ev.reset()
    for a, b in zip(*outs):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_multi_step_finetuner(orbit_root, tmp_path):
    from orbit_tpu.learners import MultiStepLearner

    args = make_args(orbit_root, str(tmp_path / "ckpt"), mode="test",
                     learner="multi-step-learner", classifier="linear",
                     personalize_num_grad_steps=3,
                     personalize_learning_rate=0.1)
    learner = MultiStepLearner(args)
    learner.run()
    results_path = learner.test_evaluator.json_results_path
    with open(results_path) as f:
        results = json.load(f)
    assert set(results.keys()) == {"P001", "P002"}


def test_multi_step_finetuner_film(orbit_root, tmp_path):
    from orbit_tpu.learners import MultiStepLearner

    args = make_args(orbit_root, str(tmp_path / "ckpt"), mode="test",
                     learner="multi-step-learner", classifier="linear",
                     adapt_features=True,
                     personalize_num_grad_steps=2,
                     personalize_learning_rate=0.01)
    learner = MultiStepLearner(args)
    learner.run()


def test_finetuner_actually_learns(orbit_root, tmp_path):
    """Head finetuning on cached features must fit the (colour-separable)
    synthetic context set far better than chance."""
    import jax.numpy as jnp
    from orbit_tpu.data.episodes import pad_episode
    from orbit_tpu.learners.multi_step import build_finetune_fns
    from orbit_tpu.learners.single_step import SingleStepLearner
    from orbit_tpu.learners import MultiStepLearner
    from orbit_tpu.models import heads as heads_lib

    # NB: a randomly-initialised EfficientNet contracts activations to ~1e-6
    # norms, so fitting the zero-init head takes a few hundred Adam steps;
    # with pretrained weights tens suffice (the reference default is 50).
    args = make_args(orbit_root, str(tmp_path / "ckpt"), mode="test",
                     learner="multi-step-learner", classifier="linear",
                     personalize_num_grad_steps=200,
                     personalize_learning_rate=0.01)
    learner = MultiStepLearner(args)
    task = next(learner.test_queue.get_tasks())
    ep = pad_episode(task)
    personalise, _ = build_finetune_fns(learner.recogniser, args)
    task_params = personalise(learner.variables,
                              jnp.asarray(ep.context_clips),
                              jnp.asarray(ep.context_labels),
                              jnp.asarray(ep.context_mask),
                              jnp.asarray(ep.class_mask))
    feats = learner.recogniser.embed_clips(
        learner.variables, jnp.asarray(ep.context_clips), None,
        train=False, with_grad=False)
    logits = heads_lib.predict_linear(task_params["head"], feats,
                                      class_mask=jnp.asarray(ep.class_mask))
    n = int(ep.context_mask.sum())
    preds = np.asarray(logits)[:n].argmax(-1)
    acc = (preds == np.asarray(ep.context_labels)[:n]).mean()
    assert acc > 0.8, f"context accuracy after finetuning too low: {acc}"


def test_eval_data_parallel_mismatch_warns_loudly(orbit_root, tmp_path):
    """--data_parallel beyond the visible device count must not degrade
    silently at eval (round-2 verdict #9): the learner proceeds single-chip
    but says so in the log."""
    from orbit_tpu.learners import SingleStepLearner

    args = make_args(orbit_root, str(tmp_path / "ckpt"), mode="test",
                     data_parallel="64")  # 8 virtual CPU devices available
    learner = SingleStepLearner(args)
    logged = open(os.path.join(learner.checkpoint_dir, "log.txt")).read()
    assert "WARNING" in logged and "--data_parallel 64" in logged
    learner.logfile.close()


def test_single_step_test_protocol_vit(orbit_root, tmp_path):
    """CLU-VE test protocol end-to-end on a ViT backbone — the bench
    headline family (PERF.md) previously had no driver-level coverage
    (all learner e2e tests used efficientnet_b0). 84px -> 2x2 patches +
    cls = 5 tokens through the fused-attention code path (XLA impl on
    this CPU host; kernel parity is covered in test_tiny_attention)."""
    from orbit_tpu.learners import SingleStepLearner

    import json

    args = make_args(orbit_root, str(tmp_path / "ckpt"), mode="test",
                     feature_extractor="vit_s_32")
    learner = SingleStepLearner(args)
    learner.run()
    with open(learner.test_evaluator.json_results_path) as f:
        results = json.load(f)
    assert results  # one entry per test user, challenge schema
