"""Run-dir / formatter utilities (reference: utils/logging.py:8-60)."""
import os

from orbit_tpu.utils.logging import (convert_to_microseconds, convert_to_minutes,
                                     get_log_files, print_and_log, stats_to_str)


def test_get_log_files_layout(tmp_path):
    run_dir, logfile, best, final = get_log_files(str(tmp_path / "ckpts"))
    assert os.path.isdir(run_dir)
    assert best.endswith("best.ckpt") and final.endswith("final.ckpt")
    print_and_log(logfile, "hello")
    logfile.close()
    with open(os.path.join(run_dir, "log.txt")) as f:
        assert "hello" in f.read()


def test_stats_to_str_formats_percentages():
    s = stats_to_str({"frame_acc": [0.7395, 0.0052]})
    assert "73.95" in s and "0.52" in s
    s2 = stats_to_str({"frame_acc": 0.5})
    assert "50.00" in s2


def test_time_formatters():
    assert convert_to_minutes(125) == "2m5s"
    assert convert_to_minutes(0.42) == "0.42s"
    assert convert_to_microseconds(0.00125) == "1250μs"
