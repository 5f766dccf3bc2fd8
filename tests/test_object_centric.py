"""Object-centric episodic tasks: the reference ships this path but its
__getitem__ has a missing-argument crash (SURVEY.md §4 latent bug 2 —
datasets.py:637). Here it is a working first-class mode."""
import numpy as np

from orbit_tpu.data.queues import ObjectEpisodicDatasetQueue


def test_object_centric_tasks(orbit_fixture_tree):
    queue = ObjectEpisodicDatasetQueue(
        orbit_fixture_tree, "random", 15, ("random", "random"), (2, 1),
        ("clean", "clutter"), 4, ("uniform", "random"), 1, 32, "imagenet",
        num_tasks=1, test_mode=False, shuffle=False, seed=3, prefetch=0)
    # one task per object in the split
    assert len(queue) == queue.index.num_objects

    tasks = list(queue.get_tasks())
    assert len(tasks) == queue.index.num_objects
    for task in tasks:
        labels = np.asarray(task["context_labels"])
        way = len(task["object_list"])
        assert 2 <= way <= 15
        assert set(labels.tolist()) == set(range(way))
        # objects can come from different users in object-centric mode
        assert task["context_clips"].shape[0] == labels.shape[0]
        assert np.isfinite(task["context_clips"]).all()
