"""The shipped dataset-metadata artifacts (data/*.json, data/*.txt) parse and
drive ``build_index(with_cluster_labels=True)`` end-to-end.

The reference ships these alongside its code (reference: data/ directory;
loaded at data/datasets.py:106-118). They are dataset artifacts (MIT), shipped
verbatim here so the cluster-label path works out of the box.
"""
import json
import os

import numpy as np
from PIL import Image

from orbit_tpu.data.index import build_index

REPO_DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


def test_artifacts_present_and_parse():
    for mode in ("train", "validation", "test"):
        with open(os.path.join(REPO_DATA, f"orbit_{mode}_object_cluster_labels.json")) as f:
            vid2cluster = json.load(f)
        assert vid2cluster and all(isinstance(v, int) for v in vid2cluster.values())
        # keys are canonical video names: user--object--vtype--hash
        k = next(iter(vid2cluster))
        assert len(k.split("--")) >= 4 and k.split("--")[2] in ("clean", "clutter")

    with open(os.path.join(REPO_DATA, "orbit_benchmark_mode_splits.json")) as f:
        splits = json.load(f)
    assert set(splits) == {"train", "validation", "test"}

    with open(os.path.join(REPO_DATA, "orbit_benchmark_users_to_split.json")) as f:
        users_to_split = json.load(f)
    # every benchmark user appears in exactly one mode split
    all_split_users = [u for us in splits.values() for u in us]
    assert len(all_split_users) == len(set(all_split_users))

    for fname in ("object_clusters_benchmark.txt", "object_clusters_full.txt",
                  "orbit_dataset_readme.txt"):
        with open(os.path.join(REPO_DATA, fname)) as f:
            assert f.read().strip()


def test_build_index_consumes_shipped_cluster_labels(tmp_path):
    """Build a tiny frame tree whose video names come from the REAL test-split
    cluster-label file, then index it with with_cluster_labels=True against
    the shipped artifacts (reference: datasets.py:106-118,192-193)."""
    with open(os.path.join(REPO_DATA, "orbit_test_object_cluster_labels.json")) as f:
        vid2cluster = json.load(f)

    # pick 2 users x up-to-2 objects that have both clean and clutter videos
    by_obj = {}
    for vid in vid2cluster:
        parts = vid.split("--")
        # hashes may themselves contain '--'; vtype is the 3rd field
        user, obj, vtype = parts[0], parts[1], parts[2]
        if vtype not in ("clean", "clutter"):
            continue
        by_obj.setdefault((user, obj), {}).setdefault(vtype, []).append(vid)
    eligible = [(k, v) for k, v in by_obj.items() if "clean" in v and "clutter" in v]
    chosen, users = [], []
    for (user, obj), vids in sorted(eligible):
        if user not in users and len(users) < 2:
            users.append(user)
        if user in users and sum(1 for (u, _), _ in chosen if u == user) < 2:
            chosen.append(((user, obj), vids))
    assert len(chosen) >= 3

    root = tmp_path / "test"
    img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
    for (user, obj), vids in chosen:
        for vtype, n_frames in (("clean", 2), ("clutter", 50)):
            vid = sorted(vids[vtype])[0]
            vdir = root / user / obj / vtype / vid
            vdir.mkdir(parents=True)
            for i in range(n_frames):
                img.save(vdir / f"{vid}-{i + 1:05d}.jpg")

    index = build_index(str(root), with_cluster_labels=True,
                        cluster_label_dir=REPO_DATA)
    assert index.num_objects == len(chosen)
    assert set(index.obj2cluster) == set(range(index.num_objects))
    # cluster ids index the split-wide sorted vocabulary
    n_classes = len(index.cluster_classes)
    assert n_classes == len(set(vid2cluster.values()))
    for obj_id, cid in index.obj2cluster.items():
        assert 0 <= cid < n_classes
        # the id maps back to the raw label of one of the object's videos
        raw = index.cluster_classes[cid]
        vids = by_obj[(index.obj2user[obj_id], index.obj2name[obj_id])]
        assert raw in {vid2cluster[v] for vs in vids.values() for v in vs}
