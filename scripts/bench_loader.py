#!/usr/bin/env python
"""Host ingest benchmark: JPEG decode -> resize -> normalize frames/sec.

The CLU-VE eval is device-fast (PERF.md: 13k+ query frames/sec on one v5e
for ViT-B/32), so end-to-end throughput on the real dataset is set by the
HOST pipeline (the reference's torch DataLoader workers play this role,
data/queues.py:44). This script measures our two decode paths on a
synthetic ORBIT-like frame tree:

  - PIL path    (orbit_tpu/data/loader.py _decode fallback)
  - native path (orbit_tpu/data/_native/orbit_decoder.cpp — libjpeg with
                 DCT prescaling, built via scripts/build_native.sh)

Usage: python scripts/bench_loader.py [--frames 512] [--size 224]
       [--src-size 1080] [--threads 4]

Prints one JSON line with frames/sec per path.
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_tree(n_frames: int, src_size: int, _dirs=[]) -> list:
    import atexit
    import shutil

    from PIL import Image

    d = tempfile.mkdtemp(prefix="orbit_ingest_bench_")
    _dirs.append(d)
    atexit.register(lambda: [shutil.rmtree(x, ignore_errors=True)
                             for x in _dirs])
    rng = np.random.RandomState(0)
    paths = []
    base = rng.randint(0, 255, (src_size, src_size, 3)).astype(np.uint8)
    for i in range(n_frames):
        # perturb so JPEGs differ (defeats any OS page-cache-level dedup)
        img = np.clip(base.astype(np.int16) + rng.randint(-8, 8, 3), 0, 255)
        p = os.path.join(d, f"frame-{i:05d}.jpg")
        Image.fromarray(img.astype(np.uint8)).save(p, quality=85)
        paths.append(p)
    return paths


def bench(loader, paths, repeats: int = 3) -> float:
    arr = np.asarray(paths)
    loader.load_paths(arr[: min(32, len(paths))])  # warm (thread pool, so)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = loader.load_paths(arr)
        dt = time.perf_counter() - t0
        assert out.shape[0] == len(paths)
        best = max(best, len(paths) / dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--src-size", type=int, default=1080)
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()

    from orbit_tpu.data.loader import FrameLoader

    paths = make_tree(args.frames, args.src_size)
    out = {"frames": args.frames, "src_px": args.src_size,
           "out_px": args.size, "threads": args.threads}

    from orbit_tpu.data.native_decoder import native_available

    for name, use_native in (("pil", False), ("native", True)):
        if use_native and not native_available():
            out["native_fps"] = None  # build unavailable
            continue
        ld = FrameLoader(args.size, "imagenet", num_threads=args.threads,
                         use_native=use_native)
        fps = bench(ld, paths)
        if use_native and not ld.use_native:
            out["native_fps"] = None  # decode error mid-bench; fell back
            continue
        out[f"{name}_fps"] = round(fps, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
