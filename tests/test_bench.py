"""Smoke tests for the driver-run benchmark entry points (bench.py).

bench.py is executed by the round driver on the real TPU; these tests pin
its measurement functions at miniature shapes on CPU so a refactor of the
learner/recogniser APIs cannot silently break the benchmark."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_lite_train_step_time_runs():
    import bench

    sec = bench.lite_train_step_time("vit_s_32", ctx=8, tgt=4, batch=4,
                                     lite=2, way=2, frame=32)
    assert sec > 0.0
