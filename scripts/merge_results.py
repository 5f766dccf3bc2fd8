#!/usr/bin/env python
"""Merge challenge-format results.json shards from a host-parallel run.

With ``--num_hosts N`` each host evaluates a disjoint strided slice of the
task stream and writes its own ``results.json`` (challenge format:
``{user: [{task_object_list, task_macs_to_personalise, task_videos}]}`` —
reference eval_metrics.py:112-153). Sharding is at whole-user block
granularity, but the merge still concatenates per-user task lists so it
also handles streams sharded by other tools.

    python scripts/merge_results.py out.json shard0/results.json shard1/results.json ...
"""
import argparse
import json


def merge(shards):
    out = {}
    for shard in shards:
        for user, tasks in shard.items():
            out.setdefault(user, []).extend(tasks)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("output")
    p.add_argument("shards", nargs="+")
    a = p.parse_args()

    shards = []
    for path in a.shards:
        with open(path) as f:
            shards.append(json.load(f))
    merged = merge(shards)
    with open(a.output, "w") as f:
        json.dump(merged, f)
    n_tasks = sum(len(t) for t in merged.values())
    print(f"merged {len(a.shards)} shards -> {len(merged)} users, "
          f"{n_tasks} tasks -> {a.output}")


if __name__ == "__main__":
    main()
