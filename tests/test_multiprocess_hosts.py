"""Multi-host rehearsal with REAL separate JAX processes (round-2 verdict #10).

Two OS processes join a local ``jax.distributed`` coordinator and run the
sharded CLU-VE eval with NO ``--num_hosts``/``--host_index`` flags — the
derived path (``resolve_host_sharding`` reading ``jax.process_count()`` /
``jax.process_index()``), which had only ever executed single-process. Their
per-shard challenge ``results.json`` files are then combined with
``scripts/merge_results.py`` and must equal the single-host run's results
exactly, per user (keyed plan seeding makes the k-th task of a user a pure
function of run config — orbit_tpu/data/queues.py)."""
import json
import os
import socket
import subprocess
import sys

import pytest

CHILD = r'''
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_TEST_CACHE", "/tmp/orbit_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
proc_id, n_procs, port, repo, data_root, ckpt = sys.argv[1:7]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=int(n_procs), process_id=int(proc_id))
sys.path.insert(0, repo)
from orbit_tpu.utils.args import parse_args
from orbit_tpu.learners import SingleStepLearner
args = parse_args("single-step-learner", [
    "--data_path", data_root, "--checkpoint_dir", ckpt,
    "--mode", "test", "--classifier", "proto",
    "--feature_extractor", "efficientnet_b0", "--frame_size", "84",
    "--num_test_tasks", "2", "--context_shot", "2", "--target_shot", "1",
    "--subsample_factor", "2", "--batch_size", "8",
    "--test_target_clip_method", "random"])
learner = SingleStepLearner(args)
learner.run()
print("RESULTS_JSON:" + str(learner.test_evaluator.json_results_path), flush=True)
'''


def test_two_process_sharded_eval_merges_to_single_host(
        orbit_fixture_tree, tmp_path_factory):
    from tests.test_learners import make_args
    from orbit_tpu.learners import SingleStepLearner

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import merge_results

    root = tmp_path_factory.mktemp("mp_root")
    src = os.path.realpath(orbit_fixture_tree)
    for mode in ("train", "validation", "test"):
        os.symlink(src, root / mode)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # ---- single-host reference run (this process; process_count == 1) ----
    args = make_args(str(root), str(tmp_path_factory.mktemp("ck_single")),
                     mode="test", num_test_tasks="2")
    learner = SingleStepLearner(args)
    learner.run()
    with open(learner.test_evaluator.json_results_path) as f:
        single = json.load(f)
    assert set(single) == {"P001", "P002"}

    # ---- two real processes over a local coordinator ----
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    child_py = tmp_path_factory.mktemp("mp") / "child.py"
    child_py.write_text(CHILD)
    procs, ckpts = [], []
    for i in range(2):
        ckpt = str(tmp_path_factory.mktemp(f"ck_mp{i}"))
        ckpts.append(ckpt)
        procs.append(subprocess.Popen(
            [sys.executable, str(child_py), str(i), "2", str(port), repo,
             str(root), ckpt],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    shards = []
    for out in outs:
        path = [l for l in out.splitlines() if l.startswith("RESULTS_JSON:")]
        assert path, out[-3000:]
        with open(path[0].split(":", 1)[1]) as f:
            shards.append(json.load(f))

    # derived grid really sharded: each process saw a disjoint user subset
    users = [set(s) for s in shards]
    assert users[0] and users[1] and not (users[0] & users[1])

    merged = merge_results.merge(shards)
    assert set(merged) == set(single)
    for user in single:  # per-user equality with the single-host run
        assert merged[user] == single[user], user
