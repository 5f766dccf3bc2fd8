#!/usr/bin/env python
"""Reconstitute benchmark users from the unfiltered dataset's ``other`` pool:
merge each other/P* user into the main tree, then split merged benchmark
users back into their original collectors per the split JSON.

Reference equivalent: scripts/merge_and_split_benchmark_users.py
(merge_users :22-51, split_users :53-81). Frame/video names have the user id
as their first ``--``-separated token, so renames rewrite that prefix.
"""
import argparse
import glob
import json
import os
import shutil


def merge_users(data_path):
    other_root = os.path.join(data_path, "other")
    for other_user in sorted(os.listdir(other_root)):
        other_user_path = os.path.join(other_root, other_user)
        if not os.path.isdir(other_user_path):
            continue
        print(f"Merging {other_user}")
        user_path = os.path.join(data_path, other_user)
        if os.path.exists(user_path):
            for obj in os.listdir(other_user_path):
                for video_type in os.listdir(os.path.join(other_user_path, obj)):
                    type_dir = os.path.join(other_user_path, obj, video_type)
                    new_type_dir = os.path.join(user_path, obj, video_type)
                    os.makedirs(new_type_dir, exist_ok=True)
                    for video in os.listdir(type_dir):
                        shutil.move(os.path.join(type_dir, video),
                                    os.path.join(new_type_dir, video))
        else:
            shutil.move(other_user_path, user_path)
    shutil.rmtree(other_root)
    print(f"Merged users re-saved to {data_path}")


def split_users(data_path, split_json):
    with open(split_json) as f:
        users_to_split = json.load(f)

    for benchmark_user, new_users in users_to_split.items():
        print(f"Splitting {benchmark_user} into {' '.join(new_users)}")
        benchmark_user_dir = os.path.join(data_path, benchmark_user)
        for user, user_objs in new_users.items():
            user_dir = os.path.join(data_path, user)
            assert not os.path.exists(user_dir), f"{user_dir} exists!"
            os.makedirs(user_dir)
            for obj in user_objs:
                src_obj_dir = os.path.join(benchmark_user_dir, obj)
                assert os.path.exists(src_obj_dir), f"{src_obj_dir} does not exist"
                obj_dir = os.path.join(user_dir, obj)
                shutil.copytree(src_obj_dir, obj_dir)
                # rewrite the user-id prefix in video dir and frame names
                for video_type in os.listdir(obj_dir):
                    type_dir = os.path.join(obj_dir, video_type)
                    for video in os.listdir(type_dir):
                        new_video_dir = os.path.join(
                            type_dir, video.replace(benchmark_user, user))
                        os.rename(os.path.join(type_dir, video), new_video_dir)
                        for frame in glob.glob(os.path.join(new_video_dir, "*.jpg")):
                            os.rename(frame, os.path.join(
                                new_video_dir,
                                os.path.basename(frame).replace(benchmark_user, user)))
        shutil.rmtree(benchmark_user_dir)
    print(f"Split users re-saved to {data_path}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", required=True,
                        help="Path to unfiltered ORBIT dataset root")
    parser.add_argument("--split_json", required=True,
                        help="Path to orbit_benchmark_users_to_split.json")
    args = parser.parse_args(argv)
    merge_users(args.data_path)
    split_users(args.data_path, args.split_json)


if __name__ == "__main__":
    main()
