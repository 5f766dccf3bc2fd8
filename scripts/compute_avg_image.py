#!/usr/bin/env python
"""Mean/std pixel statistics over all train frames (per channel, in [0,1]).

Reference equivalent: scripts/compute_avg_image.py (mean of per-frame channel
means; std of per-frame channel means — note: NOT the per-pixel std).
"""
import argparse
import os

import numpy as np
from PIL import Image


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", required=True,
                        help="Path to ORBIT benchmark dataset root")
    args = parser.parse_args(argv)

    frame_means = []
    train_root = os.path.join(args.data_path, "train")
    for dirpath, _, filenames in os.walk(train_root):
        jpgs = [f for f in filenames if f.endswith(".jpg")]
        if jpgs:
            print(f"processing {dirpath}")
        for fname in jpgs:
            with Image.open(os.path.join(dirpath, fname)) as im:
                if im.mode != "RGB":
                    im = im.convert("RGB")
                arr = np.asarray(im, dtype=np.float64)
            frame_means.append(arr.reshape(-1, 3).mean(axis=0))

    frame_means = np.asarray(frame_means)
    avg = frame_means.mean(axis=0) / 255.0
    std = frame_means.std(axis=0) / 255.0
    print(f"pixel stats for train frames in {args.data_path}: {avg} (avg), {std} (std)")
    return avg, std


if __name__ == "__main__":
    main()
