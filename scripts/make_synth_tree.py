#!/usr/bin/env python
"""Generate a synthetic ORBIT-layout frame tree at a chosen protocol scale.

Used for end-to-end rehearsals when the real benchmark download is
unavailable (PERF.md "protocol wall clock"): frames are 224px JPEGs with a
per-object colour signature so recognition is learnable, laid out exactly
like the benchmark dataset (reference: scripts/download_benchmark_dataset.sh
FRAME_SIZE=224; tree layout data/orbit_dataset_readme.txt).

Default shape approximates the CLU-VE test split driver load: 17 users x
3 objects, 2 clean videos x 90 frames (context) + 2 clutter videos x 250
frames (target; >= 200 so random_200 samples its full 200).

Usage: python scripts/make_synth_tree.py --root /tmp/orbit_protocol \
         [--users 17] [--objects 3] [--mode test] [--frame-size 224]
"""
import argparse
import os

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--mode", default="test")
    ap.add_argument("--users", type=int, default=17)
    ap.add_argument("--objects", type=int, default=3)
    ap.add_argument("--clean-videos", type=int, default=2)
    ap.add_argument("--clean-frames", type=int, default=90)
    ap.add_argument("--clutter-videos", type=int, default=2)
    ap.add_argument("--clutter-frames", type=int, default=250)
    ap.add_argument("--frame-size", type=int, default=224)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    objects = ["mug", "keys", "wallet", "phone", "remote", "cane", "hat",
               "bag", "cup", "fob", "book", "shoe"]
    rng = np.random.RandomState(args.seed)
    hw = args.frame_size
    n = 0
    for u in range(args.users):
        user = f"P{u + 1:03d}"
        for oi in range(args.objects):
            obj = objects[oi % len(objects)]
            color = rng.randint(0, 255, 3)
            for vtype, nv, nf in (("clean", args.clean_videos, args.clean_frames),
                                  ("clutter", args.clutter_videos, args.clutter_frames)):
                for v in range(nv):
                    vid = f"{user}--{obj}--{vtype}--V{v}"
                    d = os.path.join(args.root, args.mode, user, obj, vtype, vid)
                    os.makedirs(d, exist_ok=True)
                    # one noise field reused per video keeps generation fast;
                    # per-frame brightness jitter keeps frames distinct
                    noise = rng.randint(-18, 18, (nf, 1, 1, 1))
                    base = np.clip(
                        color[None, None, :] + rng.randint(-18, 18, (hw, hw, 3)),
                        18, 237).astype(np.int16)
                    for f in range(nf):
                        img = np.clip(base + noise[f], 0, 255).astype(np.uint8)
                        Image.fromarray(img).save(
                            os.path.join(d, f"{vid}-{f + 1:05d}.jpg"), quality=85)
                        n += 1
        print(f"{user}: done ({n} frames so far)", flush=True)
    print(f"tree at {args.root}/{args.mode}: {n} frames")


if __name__ == "__main__":
    main()
