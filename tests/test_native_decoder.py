"""Native (C++ libjpeg) decode pipeline tests. Skipped when the library
cannot be built (no g++/libjpeg)."""
import glob
import os

import numpy as np
import pytest

from orbit_tpu.data.loader import FrameLoader


def _paths(tree, n=16):
    return sorted(glob.glob(os.path.join(tree, "*/*/*/*/*.jpg")))[:n]


native = pytest.importorskip("orbit_tpu.data.native_decoder")
if not native.native_available():
    pytest.skip("native decoder unavailable", allow_module_level=True)

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def test_same_size_decode_matches_pil(orbit_fixture_tree):
    """At the stored frame size (the standard protocol: dataset pre-resized
    to frame_size) the native path must be bit-equal to PIL up to float
    rounding."""
    paths = _paths(orbit_fixture_tree, 8)
    from PIL import Image

    size = Image.open(paths[0]).size[0]
    pil = FrameLoader(size, "imagenet", num_threads=1, use_native=False)
    ref = pil.load_paths(np.asarray(paths))
    nat = native.decode_batch(paths, size, MEAN, STD, n_threads=2)
    np.testing.assert_allclose(nat, ref, atol=1e-5)


def test_resized_decode_close_to_pil(orbit_fixture_tree):
    """Across a resize the filters differ (bilinear vs LANCZOS) but outputs
    must stay statistically close."""
    paths = _paths(orbit_fixture_tree, 8)
    pil = FrameLoader(84, "imagenet", num_threads=1, use_native=False)
    ref = pil.load_paths(np.asarray(paths))
    nat = native.decode_batch(paths, 84, MEAN, STD, n_threads=2)
    assert nat.shape == ref.shape
    assert float(np.abs(nat - ref).mean()) < 0.05


def test_frameloader_auto_uses_native(orbit_fixture_tree):
    loader = FrameLoader(32, "imagenet", num_threads=2)
    assert loader.use_native
    paths = np.asarray(_paths(orbit_fixture_tree, 6)).reshape(3, 2)
    out = loader.load_paths(paths)
    assert out.shape == (3, 2, 32, 32, 3)
    assert np.isfinite(out).all()


def test_missing_file_falls_back(orbit_fixture_tree, tmp_path):
    loader = FrameLoader(32, "imagenet", num_threads=1)
    with pytest.raises(Exception):
        loader.load_paths(np.asarray([str(tmp_path / "nope.jpg")]))
