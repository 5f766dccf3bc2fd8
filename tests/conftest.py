"""Test config: force JAX onto CPU with 8 virtual devices so multi-chip
sharding (pjit/shard_map) is exercised without TPU hardware — the idiomatic
JAX fake backend (SURVEY.md §4)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may pin a TPU platform

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A pytest plugin may import jax before this conftest runs, in which case the
# env var above is too late — force the platform through the config API too.
import jax
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA-CPU compiles of
# backbone programs; caching them on disk makes re-runs fast.
_cache_dir = os.environ.get("JAX_TEST_CACHE", "/tmp/orbit_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="session")
def orbit_fixture_tree(tmp_path_factory):
    """Synthetic ORBIT-layout tree: 2 users x 2-3 objects, clean+clutter
    videos of small JPEG frames, plus annotations (SURVEY.md §4 test plan b).

    Frames carry a per-object colour so recognition is learnable; sizes are
    32x32 to keep decode fast.
    """
    root = tmp_path_factory.mktemp("orbit_data")
    mode_dir = root / "test"
    ann_dir = root / "annotations" / "test"
    ann_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)

    users = {
        "P001": ["mug", "keys", "wallet"],
        "P002": ["phone", "remote"],
    }
    frame_size = 32
    import json

    for user, objects in users.items():
        for oi, obj in enumerate(objects):
            base_color = rng.randint(0, 255, size=3)
            for vtype, n_videos, n_frames in [("clean", 2, 12), ("clutter", 2, 60)]:
                for v in range(n_videos):
                    video_name = f"{user}--{obj}--{vtype}--V{v}"
                    vdir = mode_dir / user / obj / vtype / video_name
                    vdir.mkdir(parents=True)
                    anns = {}
                    for f in range(n_frames):
                        img = np.clip(
                            base_color[None, None, :]
                            + rng.randint(-20, 20, size=(frame_size, frame_size, 3)),
                            0, 255,
                        ).astype(np.uint8)
                        fname = f"{video_name}-{f + 1:05d}.jpg"
                        Image.fromarray(img).save(vdir / fname, quality=90)
                        anns[fname] = {
                            "object_not_present_issue": bool(f % 7 == 6),
                            "blur_issue": False,
                            "object_bounding_box": {"x": 100, "y": 120, "w": 300, "h": 280},
                        }
                    with open(ann_dir / f"{video_name}.json", "w") as fh:
                        json.dump(anns, fh)
    return str(mode_dir)
