"""Evaluator unit tests against hand-computed values
(reference: utils/eval_metrics.py:14-363)."""
import json

import numpy as np
import pytest

from orbit_tpu.utils.eval_metrics import (Evaluator, TestEvaluator,
                                          TrainEvaluator, ValidationEvaluator,
                                          clever_format, softmax)


def probs_for(preds, num_classes=4):
    p = np.full((len(preds), num_classes), 0.01, np.float32)
    for i, c in enumerate(preds):
        p[i, c] = 0.9
    return p


def test_frame_accuracy_and_ci():
    ev = Evaluator(["frame_acc"])
    labels = np.array([1, 1, 1, 1])
    probs = probs_for([1, 1, 0, 2])
    assert ev.get_frame_accuracy(labels, probs) == 0.5
    scores = [0.0, 1.0]
    # 1.96 * std([0,1]) / sqrt(2) = 1.96 * 0.5 / 1.4142
    np.testing.assert_allclose(ev.get_confidence_interval(scores),
                               1.96 * 0.5 / np.sqrt(2), rtol=1e-6)


def test_video_accuracy_majority_vote():
    ev = Evaluator(["video_acc"])
    # majority predicts class 2
    probs = probs_for([2, 2, 1])
    assert ev.get_video_accuracy(2, probs) == 1.0
    assert ev.get_video_accuracy(1, probs) == 0.0


def test_frames_to_recognition():
    ev = Evaluator(["frames_to_recognition"])
    probs = probs_for([0, 0, 3, 3])
    assert ev.get_frames_to_recognition(3, probs) == 2 / 4
    assert ev.get_frames_to_recognition(1, probs) == 1.0  # never correct


def test_train_evaluator_running_mean():
    ev = TrainEvaluator(["frame_acc"])
    ev.update_stats(np.log(probs_for([0, 0])), np.array([0, 1]))  # acc .5
    ev.update_stats(np.log(probs_for([1, 1])), np.array([1, 1]))  # acc 1
    mean, ci = ev.get_mean_stats()["frame_acc"]
    assert mean == 0.75


def test_test_evaluator_four_views_and_save(tmp_path):
    ev = TestEvaluator(["frame_acc"], save_dir=str(tmp_path))
    # user P1, one task, two videos of 2 frames
    ev.set_task_object_list(["mug", "keys"])
    v0, v1 = "P1--mug--clutter--V0", "P1--keys--clutter--V1"
    ev.append_video(np.log(probs_for([0, 0])), 0,
                    [f"{v0}/{v0}-00001.jpg", f"{v0}/{v0}-00002.jpg"])
    ev.append_video(np.log(probs_for([0, 1])), 1,
                    [f"{v1}/{v1}-00001.jpg", f"{v1}/{v1}-00002.jpg"])
    ev.set_current_user("P1")
    user_s, obj_s, task_s, video_s = ev.get_mean_stats()
    assert video_s["frame_acc"][0] == pytest.approx(0.75)  # (1.0 + 0.5)/2
    assert user_s["frame_acc"][0] == pytest.approx(0.75)   # 3 of 4 frames
    assert task_s["frame_acc"][0] == pytest.approx(0.75)

    ev.save()
    with open(ev.json_results_path) as f:
        out = json.load(f)
    assert list(out) == ["P1"]
    task = out["P1"][0]
    assert task["task_object_list"] == ["mug", "keys"]
    videos = task["task_videos"]
    assert set(videos) == {"P1--mug--clutter--V0", "P1--keys--clutter--V1"}
    assert videos["P1--mug--clutter--V0"] == {"1": 0, "2": 0}


def test_test_evaluator_dedups_padded_paths():
    ev = TestEvaluator(["frame_acc"])
    ev.set_task_object_list(["a"])
    # same path twice (the reference pads videos by repeating frames)
    ev.append_video(np.log(probs_for([0, 0, 1])), 0,
                    ["v-00001.jpg", "v-00002.jpg", "v-00002.jpg"])
    assert ev.all_frame_probs[0][0][0].shape[0] == 2


def test_validation_evaluator_best_tracking():
    ev = ValidationEvaluator(["frame_acc"])
    s1 = {"frame_acc": [0.5, 0.1]}
    s2 = {"frame_acc": [0.6, 0.1]}
    assert ev.is_better(s1)
    ev.replace(s1)
    assert ev.is_better(s2)
    ev.replace(s2)
    assert not ev.is_better(s1)


def test_clever_format():
    assert clever_format(4.78e12) == "4.78T"
    assert clever_format(2.2e9) == "2.20G"
    assert clever_format(5.5e5) == "550.00K"
    assert clever_format(12.0) == "12.00B"
