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


def test_host_sharding_through_dataloader_facade(orbit_fixture_tree):
    """--num_hosts/--host_index reach the queues via the DataLoader facade:
    two hosts with the same seed get disjoint, deterministic task streams
    whose interleave is the single-host stream (SURVEY §2.9 item 3)."""
    import os
    from types import SimpleNamespace

    from orbit_tpu.data.dataloaders import DataLoader, resolve_host_sharding

    data_root = os.path.dirname(os.path.realpath(orbit_fixture_tree))

    def info(num_shards, shard_index):
        base = dict(
            mode="test", data_path=data_root, test_set="test",
            train_object_cap=15, test_object_cap=15,
            with_train_shot_caps=False, with_cluster_labels=False,
            train_way_method="max", test_way_method="max",
            train_shot_methods=("max", "max"), test_shot_methods=("max", "max"),
            shots=(2, 1), video_types=("clean", "clutter"),
            train_clip_methods=("uniform", "random"),
            test_clip_methods=("uniform", "random_200"),
            clip_length=1, num_train_tasks=2, num_val_tasks=1, num_test_tasks=2,
            subsample_factor=4, frame_size=32, frame_norm_method="imagenet",
            annotations_to_load=[], train_filter_by_annotations=(None, None),
            test_filter_by_annotations=(None, None),
            train_task_type="user_centric", num_data_threads=1, seed=7,
            num_shards=num_shards, shard_index=shard_index,
        )
        return base

    def ids(num_shards, shard_index):
        q = DataLoader(info(num_shards, shard_index)).get_test_queue()
        q.prefetch = 0
        return [t["task_id"] for t in q.get_tasks()]

    all_ids = ids(1, 0)
    # sharding is at whole-user block granularity (num_test_tasks=2 per
    # user) so per-user aggregation stays correct on every shard
    blocks = [all_ids[i:i + 2] for i in range(0, len(all_ids), 2)]
    assert ids(2, 0) == [t for b in blocks[0::2] for t in b]
    assert ids(2, 1) == [t for b in blocks[1::2] for t in b]
    for b in blocks:
        assert len(set(b)) == 1  # blocks really are single-user groups

    # default flags derive from the (single-process) JAX grid
    ns, si = resolve_host_sharding(SimpleNamespace(num_hosts=0, host_index=-1))
    assert (ns, si) == (1, 0)
    assert resolve_host_sharding(
        SimpleNamespace(num_hosts=4, host_index=3)) == (4, 3)
    with pytest.raises(ValueError):
        resolve_host_sharding(SimpleNamespace(num_hosts=2, host_index=2))


def test_host_sharded_eval_end_to_end(orbit_fixture_tree, tmp_path_factory):
    """--num_hosts 2 through the full CLU-VE driver: each host evaluates its
    own whole-user blocks, finishes cleanly at its shard-local end of stream
    (no phantom next_user), writes its shard's results.json, and the merged
    shards cover every user."""
    import json
    import os
    import sys

    from tests.test_learners import make_args
    from orbit_tpu.learners import SingleStepLearner

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import merge_results

    root = tmp_path_factory.mktemp("root")
    src = os.path.realpath(orbit_fixture_tree)
    for mode in ("train", "validation", "test"):
        os.symlink(src, root / mode)

    shards = []
    for host in range(2):
        args = make_args(str(root), str(tmp_path_factory.mktemp(f"ck{host}")),
                         mode="test", num_hosts=2, host_index=host)
        learner = SingleStepLearner(args)
        learner.run()
        with open(learner.test_evaluator.json_results_path) as f:
            shards.append(json.load(f))

    users = [set(s) for s in shards]
    assert users[0] and users[1] and not (users[0] & users[1])
    merged = merge_results.merge(shards)
    assert set(merged) == {"P001", "P002"}


def test_merge_results_shards(tmp_path):
    """scripts/merge_results.py combines per-host challenge results.json
    shards (concatenating per-user task lists handles any sharding)."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import merge_results

    s0 = {"P001": [{"task_object_list": ["a"], "task_videos": {"v0": {1: 0}}}],
          "P002": [{"task_object_list": ["b"], "task_videos": {"v2": {1: 1}}}]}
    s1 = {"P001": [{"task_object_list": ["a"], "task_videos": {"v1": {1: 2}}}]}
    merged = merge_results.merge([s0, s1])
    assert set(merged) == {"P001", "P002"}
    assert len(merged["P001"]) == 2 and len(merged["P002"]) == 1

    p0, p1, out = tmp_path / "r0.json", tmp_path / "r1.json", tmp_path / "m.json"
    p0.write_text(json.dumps(s0))
    p1.write_text(json.dumps(s1))
    argv = sys.argv
    sys.argv = ["merge_results.py", str(out), str(p0), str(p1)]
    try:
        merge_results.main()
    finally:
        sys.argv = argv
    with open(out) as f:
        assert json.load(f) == json.loads(json.dumps(merged))


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
    # shards partition the global deterministic order at whole-user blocks
    # (num_tasks=2), keeping per-user aggregation shard-local
    blocks = [all_ids[i:i + 2] for i in range(0, len(all_ids), 2)]
    assert shard_ids[0] == [t for b in blocks[0::2] for t in b]
    assert shard_ids[1] == [t for b in blocks[1::2] for t in b]
    assert sorted(shard_ids[0] + shard_ids[1]) == sorted(all_ids)


def test_sharded_query_vit_fused_kernels_trace():
    """Eval-side vma contract: ShardedQuery's shard_map'd predict must trace
    through the fused Pallas forward kernels with replicated params and a
    query-sharded batch (Mosaic lowering needs a TPU; the strict-vma typing
    — out_struct/align_vma — is checked on any backend)."""
    from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser
    from orbit_tpu.ops.tiny_attention import force_impl
    from orbit_tpu.parallel import ShardedQuery, make_mesh

    rec = SingleStepFewShotRecogniser(feature_extractor_name="vit_s_32",
                                      classifier="proto", batch_size=16)
    with force_impl("xla"):
        variables = jax.jit(lambda k: rec.init(k, frame_size=64))(
            jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        ctx = jnp.asarray(rng.standard_normal((4, 1, 64, 64, 3)), jnp.float32)
        state = rec.personalise(variables, ctx,
                                jnp.asarray([0, 1, 0, 1], jnp.int32),
                                jnp.ones((4,), jnp.float32), 16,
                                train=False, with_grad=False)
    clips = jnp.zeros((16, 1, 64, 64, 3), jnp.float32)
    class_mask = jnp.asarray(np.arange(16) < 2, jnp.float32)

    sq = ShardedQuery(rec, mesh=make_mesh(4))
    with force_impl("fused"):
        traced = sq._predict.trace(variables, state, clips, class_mask)
    assert "pallas_call" in str(traced.jaxpr)
