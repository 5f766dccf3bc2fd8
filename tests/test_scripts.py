"""Ops-script smoke tests on the synthetic tree (reference: scripts/)."""
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_summarize_dataset_runs(orbit_fixture_tree, capsys):
    import summarize_dataset

    summarize_dataset.main(["--data_path", orbit_fixture_tree, "--no_modes"])
    out = capsys.readouterr().out
    assert "users" in out and "clutter" in out and "total videos" in out


def test_resize_videos_roundtrip(orbit_fixture_tree, tmp_path):
    import resize_videos

    dst = str(tmp_path / "resized")
    resize_videos.main(["--data_path", orbit_fixture_tree,
                        "--save_path", dst, "--size", "16", "--nthreads", "2"])
    # same tree shape, all frames 16x16
    src_frames = sum(len(files) for _, _, files in os.walk(orbit_fixture_tree)
                     if files)
    dst_frames = []
    for dirpath, _, files in os.walk(dst):
        for f in files:
            if f.endswith(".jpg"):
                dst_frames.append(os.path.join(dirpath, f))
    assert len(dst_frames) == src_frames
    assert Image.open(dst_frames[0]).size == (16, 16)


def test_compute_avg_image(orbit_fixture_tree, tmp_path):
    import compute_avg_image

    root = tmp_path / "root"
    os.makedirs(root)
    os.symlink(os.path.realpath(orbit_fixture_tree), root / "train")
    avg, std = compute_avg_image.main(["--data_path", str(root)])
    assert avg.shape == (3,) and (0 <= avg).all() and (avg <= 1).all()
    assert (std >= 0).all()


def test_merge_and_split(tmp_path):
    import json

    import merge_and_split_benchmark_users

    # unfiltered-style tree: P900 in main pool, P901 in other/, and P900 to
    # be split into P910/P911
    root = tmp_path / "unfiltered"
    def mk_video(user, obj, vtype, vid_user=None):
        vid_user = vid_user or user
        vid = f"{vid_user}--{obj}--{vtype}--V0"
        d = root / user if user != "other:P901" else root / "other" / "P901"
        d = d / obj / vtype / vid
        os.makedirs(d)
        Image.new("RGB", (8, 8)).save(d / f"{vid}-00001.jpg")

    mk_video("P900", "cup", "clean")
    mk_video("P900", "hat", "clean")
    mk_video("other:P901", "fob", "clean", vid_user="P901")

    split_json = tmp_path / "split.json"
    with open(split_json, "w") as f:
        json.dump({"P900": {"P910": ["cup"], "P911": ["hat"]}}, f)

    merge_and_split_benchmark_users.main(
        ["--data_path", str(root), "--split_json", str(split_json)])

    assert not (root / "other").exists()
    assert (root / "P901" / "fob").is_dir()
    assert (root / "P910" / "cup").is_dir()
    assert (root / "P911" / "hat").is_dir()
    assert not (root / "P900").exists()
    # frame names re-prefixed with the new user id
    frames = list((root / "P910" / "cup" / "clean").rglob("*.jpg"))
    assert frames and frames[0].name.startswith("P910--")
