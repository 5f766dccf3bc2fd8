"""The getting-started walkthrough script runs end to end (the reference's
orbit_challenge_getting_started.ipynb equivalent, examples/getting_started.py)
on a synthetic tree — the oracle assertion itself needs the real
dataset + pinned checkpoint and stays opt-in (--assert_oracle)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_getting_started_script_runs(orbit_fixture_tree, tmp_path):
    root = tmp_path / "root"
    root.mkdir()
    os.symlink(os.path.realpath(orbit_fixture_tree), root / "validation")

    env = dict(os.environ)
    # Hermetic CPU run: a TPU plugin registered via a sitecustomize on
    # PYTHONPATH overrides JAX_PLATFORMS=cpu (CLAUDE.md), and grabbing a
    # busy single-tenant TPU fails the test spuriously — strip it.
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "getting_started.py"),
         "--data_path", str(root), "--num_tasks", "1",
         "--feature_extractor", "efficientnet_b0", "--frame_size", "84",
         "--checkpoint_dir", str(tmp_path / "runs")],
        capture_output=True, text=True, env=env, timeout=3000)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "results.json saved under" in out.stdout
    run_dirs = list((tmp_path / "runs").iterdir())
    assert run_dirs
    with open(run_dirs[0] / "results.json") as f:
        results = json.load(f)
    assert results  # challenge-format {user: [tasks]}
