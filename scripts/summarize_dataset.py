#!/usr/bin/env python
"""Dataset statistics tables (videos/objects/frames per user, per video type).

Reference equivalent: scripts/summarize_dataset.py — output should match
Tables 2 and A.2 of the ORBIT dataset paper (reference README.md:50-55).
Reimplemented on top of a single os.scandir sweep.
"""
import argparse
import os
import sys
from collections import defaultdict

import numpy as np


def tally(mode_path):
    """Per-user list of {video_type: [num_frames per video]} dicts, one entry
    per object, plus the set of video types seen."""
    users = sorted(e.name for e in os.scandir(mode_path) if e.is_dir())
    per_user = []
    video_types = set()
    for user in users:
        user_objs = []
        user_dir = os.path.join(mode_path, user)
        for obj in sorted(e.name for e in os.scandir(user_dir) if e.is_dir()):
            obj_tally = defaultdict(list)
            obj_dir = os.path.join(user_dir, obj)
            for vtype in sorted(e.name for e in os.scandir(obj_dir) if e.is_dir()):
                video_types.add(vtype)
                type_dir = os.path.join(obj_dir, vtype)
                for video in sorted(e.name for e in os.scandir(type_dir) if e.is_dir()):
                    n_frames = sum(1 for f in os.scandir(os.path.join(type_dir, video))
                                   if f.name.endswith(".jpg"))
                    obj_tally[vtype].append(n_frames)
            user_objs.append(dict(obj_tally))
        per_user.append(user_objs)
    return users, per_user, sorted(video_types)


def frame_stats(per_user, vtype):
    per_video, per_video_per_user = [], []
    obj_mins, obj_maxs = [], []
    for user in per_user:
        user_counts = []
        for obj in user:
            counts = obj.get(vtype)
            if counts:
                per_video.extend(counts)
                user_counts.extend(counts)
                obj_mins.append(min(counts))
                obj_maxs.append(max(counts))
        if user_counts:
            per_video_per_user.append(np.mean(user_counts))
    if not per_video:
        return None
    return {
        "frames/video mean": np.mean(per_video),
        "frames/video std": np.std(per_video),
        "frames/video/user mean": np.mean(per_video_per_user),
        "min frames/object mean": np.mean(obj_mins),
        "max frames/object mean": np.mean(obj_maxs),
        "total frames": int(np.sum(per_video)),
        "total videos": len(per_video),
    }


def count_stats(per_user, vtype):
    videos_per_obj, videos_per_user, objs_per_user = [], [], []
    for user in per_user:
        n_user_videos, n_user_objs = 0, 0
        for obj in user:
            counts = obj.get(vtype)
            if counts:
                videos_per_obj.append(len(counts))
                n_user_videos += len(counts)
                n_user_objs += 1
        if n_user_objs:
            videos_per_user.append(n_user_videos)
            objs_per_user.append(n_user_objs)
    if not videos_per_obj:
        return None
    return {
        "videos/object mean": np.mean(videos_per_obj),
        "videos/user mean": np.mean(videos_per_user),
        "objects/user mean": np.mean(objs_per_user),
        "total objects": len(videos_per_obj),
    }


def print_table(title, num_users, per_user, video_types):
    print(f"\n=== {title or 'all'} ({num_users} users) ===")
    for vtype in video_types:
        fs, cs = frame_stats(per_user, vtype), count_stats(per_user, vtype)
        if fs is None:
            continue
        print(f"-- {vtype} --")
        for k, v in {**cs, **fs}.items():
            print(f"  {k:28s} {v:,.2f}" if isinstance(v, float) else f"  {k:28s} {v:,}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--combine_modes", action="store_true")
    parser.add_argument("--no_modes", action="store_true",
                        help="Root has no train/validation/test split dirs.")
    args = parser.parse_args(argv)

    modes = [""] if args.no_modes else ["train", "validation", "test"]
    if args.combine_modes:
        all_users, all_per_user, all_types = [], [], set()
        for mode in modes:
            users, per_user, vtypes = tally(os.path.join(args.data_path, mode))
            all_users.extend(users)
            all_per_user.extend(per_user)
            all_types.update(vtypes)
        print_table("combined", len(all_users), all_per_user, sorted(all_types))
    else:
        for mode in modes:
            users, per_user, vtypes = tally(os.path.join(args.data_path, mode))
            print_table(mode, len(users), per_user, vtypes)


if __name__ == "__main__":
    main()
