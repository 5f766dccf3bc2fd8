#!/usr/bin/env python
"""Resize every frame of every video to NxN (LANCZOS), preserving the
<mode>/<user>/<object>/<type>/<video> tree.

Reference equivalent: scripts/resize_videos.py (ThreadPool over video dirs).
"""
import argparse
import os
import time
from concurrent.futures import ThreadPoolExecutor

from PIL import Image


def find_video_dirs(root):
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        if any(f.endswith(".jpg") for f in filenames):
            out.append(dirpath)
            dirnames[:] = []
    return sorted(out)


def resize_video(video_dir, src_root, dst_root, size, quality=95):
    rel = os.path.relpath(video_dir, src_root)
    out_dir = os.path.join(dst_root, rel)
    os.makedirs(out_dir, exist_ok=True)
    for fname in sorted(os.listdir(video_dir)):
        if not fname.endswith(".jpg"):
            continue
        with Image.open(os.path.join(video_dir, fname)) as im:
            if im.mode != "RGB":
                im = im.convert("RGB")
            im.resize((size, size), Image.LANCZOS).save(
                os.path.join(out_dir, fname), quality=quality)
    return video_dir


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--save_path", required=True)
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--nthreads", type=int, default=12)
    args = parser.parse_args(argv)

    t0 = time.time()
    video_dirs = find_video_dirs(args.data_path)
    with ThreadPoolExecutor(max_workers=args.nthreads) as pool:
        for i, done in enumerate(pool.map(
                lambda v: resize_video(v, args.data_path, args.save_path, args.size),
                video_dirs)):
            print(f"resized video {i + 1} of {len(video_dirs)} - {done}")
    print(f"resized videos saved to {args.save_path}")
    print(f"run time: {(time.time() - t0) / 60:.2f} minutes")


if __name__ == "__main__":
    main()
