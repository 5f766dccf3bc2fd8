"""Within-task query sharding + host-sharded task streams (SURVEY.md §2.9)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_sharded_query_matches_single_device():
    from orbit_tpu.learners.steps import build_eval_fns
    from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser
    from orbit_tpu.parallel import ShardedQuery, make_mesh

    rec = SingleStepFewShotRecogniser(feature_extractor_name="efficientnet_b0",
                                      classifier="proto", batch_size=64)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=32)
    personalise, predict = build_eval_fns(rec)

    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((8, 1, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(np.arange(8) % 3, jnp.int32)
    mask = jnp.ones((8,), jnp.float32)
    class_mask = jnp.asarray((np.arange(16) < 3), jnp.float32)
    state = personalise(variables, ctx, labels, mask, class_mask)

    # 21 clips: not a multiple of the mesh size -> exercises padding
    clips = jnp.asarray(rng.standard_normal((21, 1, 32, 32, 3)), jnp.float32)
    ref = np.asarray(predict(variables, state, clips, class_mask))

    sq = ShardedQuery(rec, mesh=make_mesh(4))
    out = np.asarray(sq.predict(variables, state, clips, class_mask))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_learner_eval_uses_sharded_predict(orbit_fixture_tree, tmp_path_factory):
    """--data_parallel at test time routes predicts through ShardedQuery and
    reproduces the CLU-VE protocol end to end."""
    import json
    import os

    from tests.test_learners import make_args
    from orbit_tpu.learners import SingleStepLearner

    root = tmp_path_factory.mktemp("root")
    src = os.path.realpath(orbit_fixture_tree)
    for mode in ("train", "validation", "test"):
        os.symlink(src, root / mode)

    args = make_args(str(root), str(tmp_path_factory.mktemp("ck")), mode="test",
                     data_parallel=2)
    learner = SingleStepLearner(args)
    learner.run()
    with open(learner.test_evaluator.json_results_path) as f:
        assert set(json.load(f)) == {"P001", "P002"}


def test_host_sharded_task_stream(orbit_fixture_tree):
    from orbit_tpu.data.queues import UserEpisodicDatasetQueue

    def make(num_shards, shard_index):
        return UserEpisodicDatasetQueue(
            orbit_fixture_tree, "max", 15, ("max", "max"), (2, 1),
            ("clean", "clutter"), 4, ("uniform", "random"), 1, 32, "imagenet",
            num_tasks=2, test_mode=False, shuffle=False, seed=7, prefetch=0,
            num_shards=num_shards, shard_index=shard_index)

    all_ids = [t["task_id"] for t in make(1, 0).get_tasks()]
    shard_ids = [[t["task_id"] for t in make(2, i).get_tasks()] for i in range(2)]
    # shards partition the global deterministic order
    assert shard_ids[0] == all_ids[0::2]
    assert shard_ids[1] == all_ids[1::2]
