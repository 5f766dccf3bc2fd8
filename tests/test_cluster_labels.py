"""Object-cluster label space (reference: datasets.py:106-118,192-193 —
NB the reference's own path has a list-vs-dict bug and is dead code;
here it works): with_cluster_labels maps each task's labels into the fixed
17-cluster vocabulary instead of per-task object ids."""
import json
import os

import numpy as np
import pytest

from orbit_tpu.data.queues import UserEpisodicDatasetQueue


@pytest.fixture()
def cluster_dir(orbit_fixture_tree, tmp_path):
    """Assign each fixture video a cluster by its object name."""
    clusters = {"mug": "drinkware", "keys": "keys", "wallet": "wallets",
                "phone": "phones", "remote": "remotes"}
    vid2cluster = {}
    for user in os.listdir(orbit_fixture_tree):
        udir = os.path.join(orbit_fixture_tree, user)
        for obj in os.listdir(udir):
            for vtype in os.listdir(os.path.join(udir, obj)):
                for video in os.listdir(os.path.join(udir, obj, vtype)):
                    vid2cluster[video] = clusters[obj]
    with open(tmp_path / "orbit_test_object_cluster_labels.json", "w") as f:
        json.dump(vid2cluster, f)
    return str(tmp_path)


def test_cluster_labels_relabel_tasks(orbit_fixture_tree, cluster_dir):
    queue = UserEpisodicDatasetQueue(
        orbit_fixture_tree, "max", 15, ("max", "max"), (2, 1),
        ("clean", "clutter"), 4, ("uniform", "random"), 1, 32, "imagenet",
        num_tasks=1, test_mode=False, with_cluster_labels=True,
        shuffle=False, seed=0, prefetch=0, cluster_label_dir=cluster_dir)

    classes = queue.get_cluster_classes()
    assert sorted(classes) == classes and len(classes) == 5

    for task in queue.get_tasks():
        labels = np.asarray(task["context_labels"])
        # cluster ids index the global vocabulary, not a per-task 0..way range
        assert labels.max() < len(classes)
        names = [classes[l] for l in labels]
        assert set(names) <= {"drinkware", "keys", "wallets", "phones", "remotes"}
