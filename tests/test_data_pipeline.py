"""Unit tests for the data layer: index scan, task sampling rules, loader
shapes/normalisation, frame-history transform (SURVEY.md §4 test plan a/b)."""
import random

import numpy as np
import pytest

from orbit_tpu.data.index import build_index
from orbit_tpu.data.loader import FrameLoader
from orbit_tpu.data.sampling import (
    SamplingConfig, TaskPlan, choose_videos, compute_way,
    sample_clip_indices, sample_task_plan, task_order,
)
from orbit_tpu.data.transforms import attach_frame_history, get_batch_indices, unpack_task


# ---------------------------------------------------------------- index ----
def test_index_scan(orbit_fixture_tree):
    idx = build_index(orbit_fixture_tree)
    assert idx.users == ["P001", "P002"]
    assert idx.num_objects == 5
    assert len(idx.user2objs["P001"]) == 3
    # every object has 2 clean (context) and 2 clutter (target) videos
    for obj in range(idx.num_objects):
        assert len(idx.obj2vids[obj]["context"]) == 2
        assert len(idx.obj2vids[obj]["target"]) == 2
    # frames sorted within each video
    for frames in idx.vid2frames.values():
        assert frames == sorted(frames)


def test_index_clean_clean_split(orbit_fixture_tree):
    idx = build_index(orbit_fixture_tree, context_type="clean", target_type="clean")
    # 2 clean videos -> split=min(5, 1)=1 context, 1 target; but target needs
    # >=50 frames and clean videos have 12 -> no valid objects
    assert idx.num_objects == 0


def test_index_annotation_filtering(orbit_fixture_tree):
    # filter context frames to those WITH object_not_present_issue (1 in 7)
    idx = build_index(
        orbit_fixture_tree,
        filter_context=["object_not_present_issue"],
        annotations_to_load=["object_bounding_box"],
    )
    some_obj = idx.user2objs["P001"][0]
    ctx_video = idx.obj2vids[some_obj]["context"][0]
    # 12 clean frames -> frames 7 (f%7==6 -> f=6 i.e. frame 7) and 14(no) -> 1 frame
    assert len(idx.vid2frames[ctx_video]) == 1
    # bounding boxes were scaled from 1080 -> 224 and clamped
    any_ann = next(iter(idx.frame2anns.values()))
    bbox = any_ann["object_bounding_box"]
    assert bbox.tolist() == [int(100 / 1080 * 224), int(120 / 1080 * 224), int(300 / 1080 * 224), int(280 / 1080 * 224)]


# ------------------------------------------------------------- sampling ----
def test_compute_way_rules():
    rng = random.Random(0)
    assert compute_way(rng, 10, "max", "max") == 10
    assert compute_way(rng, 10, 4, "max") == 4
    for _ in range(20):
        w = compute_way(rng, 10, 15, "random")
        assert 2 <= w <= 10


def test_choose_videos_methods():
    rng = random.Random(0)
    videos = [f"v{i}" for i in range(8)]
    assert choose_videos(rng, videos, 3, "specific", 15) == ["v0", "v1", "v2"]
    fixed = choose_videos(rng, videos, 3, "fixed", 15)
    assert len(fixed) == 3 and len(set(fixed)) == 3
    rnd = choose_videos(rng, videos, 3, "random", 15)
    assert 1 <= len(rnd) <= 8
    mx = choose_videos(rng, videos, 3, "max", 5)
    assert len(mx) == 5  # capped
    # shot cap applies before availability
    assert len(choose_videos(rng, videos, 10, "specific", 4)) == 4


def test_sample_clip_indices_uniform_and_pad():
    rng = random.Random(0)
    # 10 frames, clip_length 4 -> padded to 12 with last frame, 3 clips
    clips = sample_clip_indices(rng, 10, "max", 4, 30)
    assert clips.shape == (3, 4)
    assert clips[-1].tolist() == [8, 9, 9, 9]
    # uniform with subsample 2 picks every 2nd clip
    clips = sample_clip_indices(rng, 100, "uniform", 1, 2)
    assert clips.reshape(-1).tolist() == list(range(0, 100, 2))


def test_sample_clip_indices_random200():
    rng = random.Random(0)
    clips = sample_clip_indices(rng, 500, "random_200", 1, 30)
    assert clips.shape == (200, 1)
    assert len(np.unique(clips)) == 200
    # short video: all clips
    clips = sample_clip_indices(rng, 60, "random_200", 1, 30)
    assert clips.shape == (60, 1)
    # frame cap of 1000
    clips = sample_clip_indices(rng, 5000, "max", 1, 30)
    assert clips.shape == (1000, 1)


def test_sample_clip_indices_random_clip_rows():
    # with clip_length > 1, sampled clips must be contiguous frame rows
    rng = random.Random(3)
    clips = sample_clip_indices(rng, 64, "random", 8, 30)
    for row in clips:
        assert row.tolist() == list(range(row[0], row[0] + 8))
        assert row[0] % 8 == 0


def test_sample_task_plan_train(orbit_fixture_tree):
    idx = build_index(orbit_fixture_tree)
    cfg = SamplingConfig(
        way_method="max", object_cap="max",
        shot_method_context="max", shot_method_target="max",
        clip_method_context="uniform", clip_method_target="random",
        clip_length=1, subsample_factor=5, test_mode=False,
    )
    rng = random.Random(42)
    plan = sample_task_plan(idx, idx.user2objs["P001"], "P001", cfg, rng)
    assert plan.object_list == ["keys", "mug", "wallet"]  # scan order is sorted
    assert plan.context_paths.shape[1] == 1
    assert set(plan.context_labels) == {0, 1, 2}
    assert plan.target_paths is not None
    assert len(plan.target_paths) == len(plan.target_labels)


def test_sample_task_plan_test_grouping(orbit_fixture_tree):
    idx = build_index(orbit_fixture_tree)
    cfg = SamplingConfig(
        way_method="max", object_cap="max",
        shot_method_context="max", shot_method_target="max",
        clip_method_context="uniform", clip_method_target="random_200",
        clip_length=1, subsample_factor=5, test_mode=True,
    )
    rng = random.Random(0)
    plan = sample_task_plan(idx, idx.user2objs["P002"], "P002", cfg, rng)
    # 2 objects x 2 target videos
    assert len(plan.target_paths_by_video) == 4
    assert sorted(set(plan.target_labels_by_video)) == [0, 1]
    # each clutter video has 60 frames -> random_200 selects all 60
    for v in plan.target_paths_by_video:
        assert len(v) == 60
        # frames within one video all share its directory
        dirs = {p.rsplit("/", 1)[0] for p in v}
        assert len(dirs) == 1


def test_dynamic_shot_caps(orbit_fixture_tree):
    idx = build_index(orbit_fixture_tree)
    cfg = SamplingConfig(way_method="max", object_cap="max", with_caps=True,
                         shot_method_context="max", shot_method_target="max",
                         clip_method_context="uniform", clip_method_target="random")
    rng = random.Random(0)
    plan = sample_task_plan(idx, idx.user2objs["P001"], "P001", cfg, rng)
    assert plan.context_paths is not None  # smoke: caps path runs


def test_task_order():
    rng = random.Random(0)
    order = task_order(rng, 3, 2, shuffle=False)
    assert order == [0, 0, 1, 1, 2, 2]
    shuffled = task_order(rng, 3, 2, shuffle=True)
    assert sorted(shuffled) == order


def test_determinism(orbit_fixture_tree):
    idx = build_index(orbit_fixture_tree)
    cfg = SamplingConfig(way_method="random", object_cap="max",
                         shot_method_context="random", shot_method_target="random",
                         clip_method_context="uniform", clip_method_target="random")
    p1 = sample_task_plan(idx, idx.user2objs["P001"], "P001", cfg, random.Random(7))
    p2 = sample_task_plan(idx, idx.user2objs["P001"], "P001", cfg, random.Random(7))
    assert np.array_equal(p1.context_paths, p2.context_paths)
    assert np.array_equal(p1.context_labels, p2.context_labels)


# --------------------------------------------------------------- loader ----
def test_loader_shapes_and_normalisation(orbit_fixture_tree):
    idx = build_index(orbit_fixture_tree)
    cfg = SamplingConfig(way_method="max", object_cap="max",
                         shot_method_context="max", shot_method_target="max",
                         clip_method_context="uniform", clip_method_target="random_200",
                         subsample_factor=5, test_mode=True)
    plan = sample_task_plan(idx, idx.user2objs["P002"], "P002", cfg, random.Random(0))
    loader = FrameLoader(frame_size=32, frame_norm_method="imagenet", num_threads=2)
    task = loader.load_task(plan)
    n_ctx = len(plan.context_paths)
    assert task["context_clips"].shape == (n_ctx, 1, 32, 32, 3)
    assert task["context_clips"].dtype == np.float32
    assert isinstance(task["target_clips"], list)
    assert task["target_clips"][0].shape == (60, 32, 32, 3)
    # normalisation: values in plausible imagenet-normalised range
    assert task["context_clips"].min() > -3.0 and task["context_clips"].max() < 3.5
    ctx, cpaths, clabels, tgt, tpaths, tlabels, objs = unpack_task(task)
    assert len(clabels) == n_ctx and len(objs) == 2


def test_frame_cache(orbit_fixture_tree, tmp_path):
    idx = build_index(orbit_fixture_tree)
    loader = FrameLoader(frame_size=32, frame_norm_method="imagenet", num_threads=1)
    loader.enable_cache(max_frames=10)
    some_video = next(iter(idx.vid2frames.values()))
    a = loader.load_frame(some_video[0])
    b = loader.load_frame(some_video[0])
    np.testing.assert_array_equal(a, b)


# ----------------------------------------------------------- transforms ----
def test_attach_frame_history():
    frames = np.arange(5, dtype=np.float32).reshape(5, 1, 1, 1)
    out = attach_frame_history(frames, 3)
    assert out.shape == (5, 3, 1, 1, 1)
    flat = out.reshape(5, 3)
    # frame i's clip = [f_{i-2}, f_{i-1}, f_i] with left-padding by frame 0
    assert flat[0].tolist() == [0, 0, 0]
    assert flat[1].tolist() == [0, 0, 1]
    assert flat[4].tolist() == [2, 3, 4]
    # history_length=1 -> just adds the clip axis
    out1 = attach_frame_history(frames, 1)
    assert out1.shape == (5, 1, 1, 1, 1)


def test_get_batch_indices():
    assert get_batch_indices(0, 10, 4) == (0, 4)
    assert get_batch_indices(2, 10, 4) == (8, 10)


# -------------------------------------------------- queue epoch ordering ----
def _order_queue(root, num_shards=1, shard_index=0, num_tasks=3):
    from orbit_tpu.data.queues import UserEpisodicDatasetQueue
    q = UserEpisodicDatasetQueue(
        root, "max", 15, ("max", "max"), (2, 1), ("clean", "clutter"), 4,
        ("uniform", "random"), 1, 32, "imagenet",
        num_tasks=num_tasks, shuffle=True, seed=7, prefetch=0,
        num_shards=num_shards, shard_index=shard_index)
    q.loader.load_task = lambda plan: plan  # skip pixel decode
    return q


def test_epoch_order_independent_of_plan_rng(orbit_fixture_tree):
    """Task ordering AND plans must be pure functions of (seed, epoch,
    item, occurrence): a streamed plan rng would consume a data-dependent
    number of draws, desynchronising multi-host shuffles after epoch 1
    (advisor finding, round 2) and making a shard's tasks differ from the
    single-host run's."""
    q1 = _order_queue(orbit_fixture_tree)
    q2 = _order_queue(orbit_fixture_tree)
    next(q2.get_tasks())  # q2 consumed differently before the epochs compared
    q2._epoch = q1._epoch = 5
    for _ in range(3):  # identical every epoch, not just the first
        plans1 = list(q1.get_tasks())
        plans2 = list(q2.get_tasks())
        assert [p.task_id for p in plans1] == [p.task_id for p in plans2]
        for a, b in zip(plans1, plans2):  # identical PLANS, not just order
            assert np.array_equal(a.context_paths, b.context_paths)


def test_shard_tasks_reproduce_single_host_plans(orbit_fixture_tree):
    """The k-th task of user u on ANY shard equals the single-host stream's
    k-th task of user u (keyed plan seeding): merged sharded eval results
    can reproduce the single-host run exactly, per user."""
    single = _order_queue(orbit_fixture_tree)
    single.shuffle = False
    by_user = {}
    for p in single.get_tasks():
        by_user.setdefault(p.task_id, []).append(p)

    for idx in range(2):
        shard = _order_queue(orbit_fixture_tree, num_shards=2, shard_index=idx)
        shard.shuffle = False
        seen = {}
        for p in shard.get_tasks():
            k = seen.get(p.task_id, 0)
            seen[p.task_id] = k + 1
            expect = by_user[p.task_id][k]
            assert np.array_equal(p.context_paths, expect.context_paths)
            if p.target_paths is not None:
                assert np.array_equal(p.target_paths, expect.target_paths)


def test_shard_blocks_stay_disjoint_across_epochs(orbit_fixture_tree):
    """Multi-host shards must partition every epoch's shuffled task order:
    each (user, task) trains on exactly one host, every epoch."""
    shards = [_order_queue(orbit_fixture_tree, num_shards=2, shard_index=i)
              for i in range(2)]
    for _ in range(3):
        ids = [[p.task_id for p in q.get_tasks()] for q in shards]
        # exact disjoint cover: together the shards yield each user's tasks
        # exactly num_tasks times, with no overlap or drop
        assert sorted(ids[0] + ids[1]) == sorted(["P001"] * 3 + ["P002"] * 3)
        assert len(ids[0]) == len(ids[1]) == 3


# ------------------------------------------------- bucket-overflow cap ----
def _synthetic_index(n_objects=15, n_videos=15, n_frames=220):
    """In-memory index (no files): worst-case un-capped train config."""
    from orbit_tpu.data.index import DatasetIndex
    idx = DatasetIndex(root="/none", mode="train", context_type="clean",
                       target_type="clutter", frame_size=224)
    idx.users = ["P900"]
    idx.user2objs = {"P900": list(range(n_objects))}
    vid_id = 0
    for obj in range(n_objects):
        idx.obj2user[obj] = "P900"
        idx.obj2name[obj] = f"obj{obj}"
        idx.obj2vids[obj] = {"context": [], "target": []}
        for vtype in ("context", "target"):
            for v in range(n_videos):
                vp = f"/none/P900/obj{obj}/{vtype}/V{v}"
                idx.obj2vids[obj][vtype].append(vp)
                idx.video2id[vp] = vid_id
                idx.vid2frames[vp] = [f"{vp}/f{f:05d}.jpg" for f in range(n_frames)]
                vid_id += 1
    return idx


def test_worst_case_task_capped_to_largest_bucket():
    """Un-capped way 15 x 15 target videos x 200 clips = 45,000 clips used to
    hard-crash pad_episode (round-2 verdict, weak #2); plan-time proportional
    subsampling must bound both sets to the largest bucket, keeping every
    video represented."""
    from orbit_tpu.data.episodes import SIZE_BUCKETS, pad_episode
    from orbit_tpu.data.sampling import MAX_CLIPS_PER_SET

    idx = _synthetic_index()
    cfg = SamplingConfig(way_method="max", object_cap="max",
                         shot_method_context="max", shot_method_target="max",
                         clip_method_context="max", clip_method_target="random_200",
                         test_mode=False)
    rng = random.Random(0)
    plan = sample_task_plan(idx, list(range(15)), "P900", cfg, rng)
    assert len(plan.target_paths) == MAX_CLIPS_PER_SET == SIZE_BUCKETS[-1]
    assert len(plan.context_paths) <= MAX_CLIPS_PER_SET
    # proportional: all 15 classes and all 225 target videos survive
    assert sorted(set(plan.target_labels.tolist())) == list(range(15))
    assert len(set(plan.target_video_ids.tolist())) == 15 * 15
    # padding no longer raises
    counts = np.bincount(plan.target_labels, minlength=15)
    assert counts.min() > 0 and abs(counts.max() - counts.min()) <= 15 * 2

    # determinism: same seed -> same subsample
    plan2 = sample_task_plan(idx, list(range(15)), "P900", cfg, random.Random(0))
    assert (plan.target_paths == plan2.target_paths).all()


def test_in_bucket_tasks_unchanged_by_cap():
    """The cap must be a no-op for tasks already inside the largest bucket."""
    idx = _synthetic_index(n_objects=2, n_videos=2, n_frames=60)
    cfg = SamplingConfig(way_method="max", object_cap="max",
                         shot_method_context="max", shot_method_target="max",
                         clip_method_context="max", clip_method_target="max",
                         clip_length=1, test_mode=False)
    p1 = sample_task_plan(idx, [0, 1], "P900", cfg, random.Random(3))
    assert len(p1.context_paths) == 2 * 2 * 60  # untouched


def test_frame_cache_lru_eviction(orbit_fixture_tree):
    """LRU, not first-N pinning: with a cap smaller than user 1's working
    set, user 2's frames must still get cache hits (round-2 verdict #10)."""
    idx = build_index(orbit_fixture_tree)
    loader = FrameLoader(frame_size=32, frame_norm_method="imagenet", num_threads=1)
    loader.enable_cache(max_frames=8)
    videos = sorted(idx.vid2frames)
    user1 = [p for v in videos[:4] for p in idx.vid2frames[v][:4]]  # 16 > cap
    user2 = [p for p in idx.vid2frames[videos[-1]][:6]]

    for p in user1:
        loader.load_frame(p)
    hits, misses = loader.cache_stats(reset=True)
    assert hits == 0 and misses == len(user1)

    # user 2 streams its frames twice (the CLU-VE 50-tasks-per-user pattern):
    # second pass must hit even though the cache filled during user 1
    for p in user2 + user2:
        loader.load_frame(p)
    hits, misses = loader.cache_stats(reset=True)
    assert hits == len(user2) and misses == len(user2)
    assert len(loader._cache) <= 8


@pytest.mark.parametrize("use_native", [False, None])
def test_frame_cache_batch_miss_decode(orbit_fixture_tree, use_native):
    """_decode_many (the --frame_cache batch path, round 5): mixed hit/miss
    lists must return PIL-identical pixels in input order, count hits/misses
    exactly, and keep the LRU bounded — whether misses batch-decode through
    the native C++ pipeline (use_native=None auto) or per-frame PIL."""
    idx = build_index(orbit_fixture_tree)
    videos = sorted(idx.vid2frames)
    paths = [p for v in videos[:3] for p in idx.vid2frames[v][:4]]  # 12 frames

    ref = FrameLoader(frame_size=32, frame_norm_method="imagenet",
                      num_threads=1, use_native=False, raw_uint8=True)
    expect = {p: ref._decode_pil(p) for p in paths}

    loader = FrameLoader(frame_size=32, frame_norm_method="imagenet",
                         num_threads=2, use_native=use_native, raw_uint8=True)
    loader.enable_cache(max_frames=8)

    # cold: all misses, batch-decoded
    out = loader._decode_many(paths[:6])
    for p, f in zip(paths[:6], out):
        np.testing.assert_array_equal(f, expect[p])
    hits, misses = loader.cache_stats(reset=True)
    assert (hits, misses) == (0, 6)

    # warm + new, interleaved: 6 hits, 6 misses, order preserved
    mixed = [p for pair in zip(paths[:6], paths[6:]) for p in pair]
    out = loader._decode_many(mixed)
    for p, f in zip(mixed, out):
        np.testing.assert_array_equal(f, expect[p])
    hits, misses = loader.cache_stats(reset=True)
    assert (hits, misses) == (6, 6)
    assert len(loader._cache) <= 8


# --------------------------------------------------- prefetch_prepared ----
def test_prefetch_prepared_order_and_equivalence():
    """The host/device pipeline stage (data/episodes.py prefetch_prepared,
    --episode_prefetch) must yield exactly the serial loop's (task, prepared)
    pairs, in order — pipelining is a wall-clock optimisation only."""
    from orbit_tpu.data.episodes import prefetch_prepared

    tasks = [{"id": i} for i in range(7)]
    prepare = lambda t: t["id"] * 10
    got = list(prefetch_prepared(iter(tasks), prepare, depth=2))
    assert got == [(t, t["id"] * 10) for t in tasks]


def test_prefetch_prepared_bounded_residency():
    """At depth d, at most d prepared-but-unconsumed episodes may exist at
    once (device buffers included) — the producer must block, not run ahead
    and pin the whole epoch on device (round-2 verdict, weak #1 analogue)."""
    import threading
    import time as _time

    from orbit_tpu.data.episodes import prefetch_prepared

    depth = 2
    prepared = []
    consumed = threading.Event()

    def prepare(t):
        prepared.append(t)
        return t

    gen = prefetch_prepared(iter(range(10)), prepare, depth=depth)
    first = next(gen)
    # give the producer ample time to run as far ahead as it can
    deadline = _time.time() + 2.0
    while _time.time() < deadline and len(prepared) < 10:
        _time.sleep(0.02)
    # 1 yielded + depth resident in the queue + 1 in-flight in prepare()
    assert len(prepared) <= 1 + depth + 1, prepared
    rest = list(gen)
    assert [first[0]] + [t for t, _ in rest] == list(range(10))


def test_prefetch_prepared_propagates_errors():
    """A decode/pad failure on the producer thread must surface as the
    consumer's exception, not hang the step loop."""
    from orbit_tpu.data.episodes import prefetch_prepared

    def tasks():
        yield 1
        yield 2

    def prepare(t):
        if t == 2:
            raise ValueError("bad episode")
        return t

    gen = prefetch_prepared(tasks(), prepare, depth=1)
    assert next(gen) == (1, 1)
    with pytest.raises(ValueError, match="bad episode"):
        list(gen)


def test_prefetch_prepared_consumer_abandonment_stops_producer():
    """If the consumer abandons the generator early (step-loop exception,
    partial iteration), closing it must stop the producer thread instead of
    leaving it blocked on a full queue holding device buffers forever."""
    import time as _time

    from orbit_tpu.data.episodes import prefetch_prepared

    prepared = []

    def prepare(t):
        prepared.append(t)
        return t

    gen = prefetch_prepared(iter(range(100)), prepare, depth=1)
    assert next(gen)[0] == 0
    gen.close()  # GeneratorExit -> finally sets the stop flag + drains

    _time.sleep(0.5)  # give the producer time to notice
    n = len(prepared)
    _time.sleep(0.5)
    assert len(prepared) == n, "producer kept producing after close"
    assert n < 100, "producer ran the whole epoch ahead of a dead consumer"


def test_pad_episode_sparse_cluster_label_space():
    """--with_cluster_labels tasks carry SPARSE ids from the split's global
    cluster vocabulary (up to ~100, data/index.py) — the class axis must
    round up past MAX_WAY instead of computing a negative pad, and the mask
    must mark only PRESENT ids (absent clusters -> -inf logits, never
    zero-count prototypes)."""
    from orbit_tpu.data.episodes import pad_episode

    task = {
        "context_clips": np.zeros((4, 1, 8, 8, 3), np.float32),
        "context_labels": np.array([0, 5, 20, 20], np.int64),
        "context_mask": np.ones(4, np.float32),
        "target_clips": np.zeros((4, 1, 8, 8, 3), np.float32),
        "target_labels": np.array([0, 5, 20, 5], np.int64),
        "target_mask": np.ones(4, np.float32),
    }
    ep = pad_episode(task)
    assert ep.way == 21
    assert ep.num_classes == 32          # next multiple of MAX_WAY
    assert ep.class_mask.shape == (32,)
    present = np.where(ep.class_mask > 0)[0].tolist()
    assert present == [0, 5, 20]

    # dense normal tasks are unchanged: ones over 0..way-1, bucket 16
    task["context_labels"] = np.array([0, 1, 2, 0], np.int64)
    task["target_labels"] = np.array([1, 2, 0, 2], np.int64)
    ep = pad_episode(task)
    assert ep.num_classes == 16 and ep.way == 3
    assert ep.class_mask[:3].tolist() == [1, 1, 1]
    assert ep.class_mask[3:].sum() == 0


def test_queue_get_tasks_abandonment_stops_producer(orbit_fixture_tree):
    """Abandoning the queue's task generator early (step-loop exception)
    must stop its decode-producer thread instead of leaving it blocked on a
    full queue pinning decoded episodes (round-4 review finding; same
    contract as prefetch_prepared)."""
    import time as _time

    from orbit_tpu.data.queues import UserEpisodicDatasetQueue

    queue = UserEpisodicDatasetQueue(
        orbit_fixture_tree, "max", 15, ("max", "max"), (2, 1),
        ("clean", "clutter"), 4, ("uniform", "random"), 1, 32, "imagenet",
        num_tasks=50, test_mode=False, shuffle=False, seed=0, prefetch=1)

    calls = []
    orig = queue.loader.load_task

    def counting(plan):
        calls.append(1)
        return orig(plan)

    queue.loader.load_task = counting
    gen = queue.get_tasks()
    next(gen)
    gen.close()  # GeneratorExit -> finally stops + drains

    _time.sleep(0.8)  # let any in-flight decode finish
    n = len(calls)
    _time.sleep(0.8)
    assert len(calls) == n, "producer kept decoding after close"
    assert n < 100, "producer decoded the whole epoch ahead of a dead consumer"

    # both stage threads must actually EXIT — a thread stranded in a bare
    # queue get() also stops decoding, which the counters above can't see
    # (round-5 review finding: the decode stage blocked forever when the
    # consumer's drain beat the plan stage's sentinel)
    import threading as _threading
    deadline = _time.time() + 5.0
    while _time.time() < deadline:
        stuck = [t for t in _threading.enumerate()
                 if t.name in ("orbit-plan-stage", "orbit-decode-stage")
                 and t.is_alive()]
        if not stuck:
            break
        _time.sleep(0.05)
    assert not stuck, f"stage threads leaked after close: {stuck}"
