"""Annotation loading in task_dicts (reference: data/datasets.py:393-420 —
per-clip last-frame annotations, NaN where absent; bounding boxes rescaled
to frame_size, datasets.py:268-281)."""
import numpy as np

from orbit_tpu.data.queues import UserEpisodicDatasetQueue


def make_queue(root, annotations, test_mode=False, filters=(None, None)):
    return UserEpisodicDatasetQueue(
        root, "max", 15, ("max", "max"), (2, 1), ("clean", "clutter"), 4,
        ("uniform", "random"), 1, 32, "imagenet",
        annotations_to_load=annotations, filter_by_annotations=filters,
        num_tasks=1, test_mode=test_mode, shuffle=False, seed=0, prefetch=0)


def test_task_dict_carries_annotations(orbit_fixture_tree):
    queue = make_queue(orbit_fixture_tree,
                       ["object_not_present_issue", "object_bounding_box"])
    task = next(queue.get_tasks())

    anns = task["context_annotations"]
    n_clips = task["context_clips"].shape[0]
    assert set(anns) == {"object_not_present_issue", "object_bounding_box"}
    assert anns["object_not_present_issue"].shape == (n_clips, 1, 1)
    assert anns["object_bounding_box"].shape == (n_clips, 1, 4)

    issue = anns["object_not_present_issue"]
    assert np.isin(issue[np.isfinite(issue)], [0.0, 1.0]).all()

    # fixture bbox is x=100,y=120,w=300,h=280 at source 1080 -> scaled to 32
    bbox = anns["object_bounding_box"]
    valid = bbox[np.isfinite(bbox).all(axis=-1)]
    expected = np.array([100, 120, 300, 280]) / 1080 * 32
    assert np.abs(valid - expected.astype(int)).max() <= 1

    tgt = task["target_annotations"]
    assert tgt["object_bounding_box"].shape[0] == task["target_clips"].shape[0]


def test_test_mode_annotations_per_video(orbit_fixture_tree):
    queue = make_queue(orbit_fixture_tree, ["blur_issue"], test_mode=True)
    task = next(queue.get_tasks())
    assert isinstance(task["target_annotations"], list)
    assert len(task["target_annotations"]) == len(task["target_clips"])
    for video_anns, video_frames in zip(task["target_annotations"], task["target_clips"]):
        assert video_anns["blur_issue"].shape == (video_frames.shape[0], 1, 1)
        # fixture blur_issue is always False -> all zeros
        assert (video_anns["blur_issue"] == 0).all()


def test_annotation_filtering_drops_frames(orbit_fixture_tree):
    """Fixture sets object_not_present_issue on every 7th frame; filtering by
    no_object_not_present_issue must exclude those frames from context."""
    queue = make_queue(orbit_fixture_tree, [],
                       filters=(["no_object_not_present_issue"], None))
    task = next(queue.get_tasks())
    for path in np.asarray(task["context_paths"]).reshape(-1):
        frame_no = int(str(path).split("-")[-1].split(".")[0])
        assert frame_no % 7 != 0, f"filtered frame leaked: {path}"
