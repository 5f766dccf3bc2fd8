#!/usr/bin/env python
"""Task-level eval parallelism benchmark: tasks/sec vs mesh size.

Measures the CLU-VE eval outer loop (personalise + predict per task,
reference: single-step-learner.py:314-357) three ways:

  - serial: one task per dispatch (the default eval loop's compute shape)
  - task-DP: groups of N same-bucket tasks, one per mesh lane
    (orbit_tpu/parallel/task_dp.py, --task_parallel N)

and reports tasks/sec per mesh size plus the host-side group-assembly
cost (build_query_block + stack_eval_group) per task.

Honesty note: this box exposes one host CPU core and one real TPU chip,
so mesh sizes > 1 here run on XLA's *virtual* CPU devices timesharing a
single core — the numbers attest the task-DP path's overhead and
semantics, not wall-clock speedup. Speedup on a real mesh follows from
lane-locality: the shard_map has no collectives (every in_spec except the
replicated variables is P("dp"); state and logits stay lane-local), so
per-lane compute is byte-identical to serial and scaling is linear in
lanes modulo the partial-group flushes measured here.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/bench_task_dp.py [--tasks 16] [--mesh 1 2 4 8]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", type=int, default=16)
    ap.add_argument("--mesh", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--frame-size", type=int, default=64)
    ap.add_argument("--way", type=int, default=4)
    ap.add_argument("--ctx", type=int, default=16, help="context clip bucket")
    ap.add_argument("--videos", type=int, default=4, help="videos per task")
    ap.add_argument("--frames", type=int, default=8, help="frames per video")
    ap.add_argument("--learner", choices=["single_step", "multi_step"],
                    default="single_step",
                    help="multi_step measures the FineTuner outer loop: each "
                         "lane runs a whole task's inner gradient loop "
                         "(TaskParallelFineTune)")
    ap.add_argument("--grad-steps", type=int, default=5,
                    help="FineTuner inner steps (multi_step only)")
    ap.add_argument("--platform", choices=["cpu", "default"], default="cpu",
                    help="cpu: virtual CPU mesh (shard_map lanes, the "
                         "semantics/overhead attestation). default: the real "
                         "device — group sizes > 1 run through "
                         "TaskBatchedEval (vmapped task axis on ONE chip), "
                         "measuring grouped vs serial dispatch on real "
                         "hardware (VERDICT r4 item 4)")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        # the axon TPU plugin ignores the JAX_PLATFORMS env var once
        # registered (CLAUDE.md); force the virtual CPU mesh through the
        # config API instead
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from orbit_tpu.data.episodes import Episode, pad_rows
    from orbit_tpu.learners.steps import build_eval_fns
    from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser
    from orbit_tpu.parallel import TaskParallelEval
    from orbit_tpu.parallel.episode_dp import make_mesh
    from orbit_tpu.parallel.task_dp import build_query_block, stack_eval_group

    hw = args.frame_size
    if args.learner == "multi_step":
        from types import SimpleNamespace

        from orbit_tpu.learners.multi_step import build_finetune_fns
        from orbit_tpu.models.recognisers import MultiStepFewShotRecogniser
        from orbit_tpu.parallel import TaskParallelFineTune

        ft_args = SimpleNamespace(
            personalize_num_grad_steps=args.grad_steps, batch_size=256,
            personalize_optimizer="adam", personalize_learning_rate=0.01,
            personalize_weight_decay=0.0, personalize_extractor_lr_scale=1.0,
            personalize_epsilon=1e-8, personalize_betas=(0.9, 0.999),
            personalize_momentum=0.0)
        rec = MultiStepFewShotRecogniser(
            feature_extractor_name="efficientnet_b0", classifier="linear",
            adapt_features=False, clip_length=1, batch_size=256,
            dtype=jnp.bfloat16)
    else:
        rec = SingleStepFewShotRecogniser(
            feature_extractor_name="efficientnet_b0", classifier="proto",
            adapt_features=False, clip_length=1, batch_size=256,
            dtype=jnp.bfloat16)
    variables = rec.init(jax.random.PRNGKey(0), frame_size=hw)

    def make_task(i):
        r = np.random.RandomState(i)
        return Episode(
            context_clips=r.rand(args.ctx, 1, hw, hw, 3).astype(np.float32),
            context_labels=(np.arange(args.ctx) % args.way).astype(np.int32),
            context_mask=np.ones(args.ctx, np.float32),
            num_classes=16,
            class_mask=(np.arange(16) < args.way).astype(np.float32),
            way=args.way,
            video_frames=[pad_rows(
                r.rand(args.frames, hw, hw, 3).astype(np.float32), args.frames)
                for _ in range(args.videos)],
            video_masks=[np.ones(args.frames, np.float32)
                         for _ in range(args.videos)],
            video_labels=[int(v % args.way) for v in range(args.videos)],
            video_paths=[np.array([f"t{i}/v{v}/f{j}" for j in range(args.frames)])
                         for v in range(args.videos)])

    eps = [make_task(i) for i in range(args.tasks)]

    # host-side group assembly cost (runs on the prefetch thread in prod)
    t0 = time.perf_counter()
    qbs = [build_query_block(e, clip_length=1) for e in eps]
    _ = stack_eval_group(eps[:8], qbs[:8], 8)
    assemble_ms = (time.perf_counter() - t0) / args.tasks * 1e3

    out = {"tasks": args.tasks, "frame_px": hw, "learner": args.learner,
           "assemble_ms_per_task": round(assemble_ms, 2), "mesh": {}}

    vmap_mode = args.platform == "default"
    if vmap_mode:
        # Real-device mode measures DISPATCH throughput: in production the
        # driver stages H2D on the prefetch thread (overlapped with device
        # compute), so host stacking + transfer must sit OUTSIDE the timed
        # region or it swamps the dispatch effect being measured (a first
        # cut timed assembly+H2D inline and read ~flat 0.8 tasks/s at every
        # group size — it was benchmarking the host, not the chip).
        clip_dt = jnp.bfloat16
        dev_tasks = [
            (jnp.asarray(e.context_clips, clip_dt),
             jnp.asarray(e.context_labels), jnp.asarray(e.context_mask),
             jnp.asarray(e.class_mask), jnp.asarray(qb.clips, clip_dt))
            for e, qb in zip(eps, qbs)]
        dev_groups = {}
        for dp in args.mesh:
            if dp > 1:
                groups = []
                for g0 in range(0, len(eps), dp):
                    b = stack_eval_group(eps[g0:g0 + dp], qbs[g0:g0 + dp], dp)
                    groups.append({
                        k: jnp.asarray(
                            v, clip_dt if "clips" in k else None)
                        for k, v in b.items()})
                dev_groups[dp] = groups
        np.asarray(dev_tasks[-1][0][0, 0])  # sync transfers
    for dp in args.mesh:
        if not vmap_mode and dp > len(jax.devices()):
            continue
        if dp == 1:
            # the serial loop's compute: per-task personalise + one batched
            # query dispatch (same jitted fns the eval driver uses)
            if args.learner == "multi_step":
                pfn_ft, dfn_ft = build_finetune_fns(rec, ft_args)
            else:
                pfn_ft, dfn_ft = build_eval_fns(rec)

            if vmap_mode:
                def run_all():
                    for cc, cl, cm, km, q in dev_tasks:
                        tp = pfn_ft(variables, cc, cl, cm, km)
                        lg = dfn_ft(variables, tp, q, km)
                    return np.asarray(lg)
            elif args.learner == "multi_step":
                def run_all():
                    for e, qb in zip(eps, qbs):
                        tp = pfn_ft(variables, jnp.asarray(e.context_clips),
                                    jnp.asarray(e.context_labels),
                                    jnp.asarray(e.context_mask),
                                    jnp.asarray(e.class_mask))
                        lg = dfn_ft(variables, tp, jnp.asarray(qb.clips),
                                    jnp.asarray(e.class_mask))
                    return np.asarray(lg)
            else:
                def run_all():
                    for e, qb in zip(eps, qbs):
                        s = pfn_ft(variables, jnp.asarray(e.context_clips),
                                   jnp.asarray(e.context_labels),
                                   jnp.asarray(e.context_mask),
                                   jnp.asarray(e.class_mask))
                        lg = dfn_ft(variables, s, jnp.asarray(qb.clips),
                                    jnp.asarray(e.class_mask))
                    return np.asarray(lg)
        elif args.learner == "multi_step":
            if vmap_mode:
                from orbit_tpu.parallel.task_dp import TaskBatchedFineTune
                tpf = TaskBatchedFineTune(rec, ft_args, dp=dp)
            else:
                tpf = TaskParallelFineTune(rec, ft_args, mesh=make_mesh(dp))

            if vmap_mode:
                def run_all(tpf=tpf, dp=dp):
                    for batch in dev_groups[dp]:
                        tp = tpf.personalise(variables, batch)
                        lg = tpf.predict(variables, tp,
                                         batch["query_clips"],
                                         batch["class_mask"])
                    return np.asarray(lg)
            else:
                def run_all(tpf=tpf, dp=dp):
                    lg = None
                    for g0 in range(0, len(eps), dp):
                        grp = eps[g0:g0 + dp]
                        gqb = qbs[g0:g0 + dp]
                        batch = {k: jnp.asarray(v) for k, v in
                                 stack_eval_group(grp, gqb, dp).items()}
                        tp = tpf.personalise(variables, batch)
                        lg = tpf.predict(variables, tp,
                                         batch["query_clips"],
                                         batch["class_mask"])
                    return np.asarray(lg)
        else:
            if vmap_mode:
                from orbit_tpu.parallel.task_dp import TaskBatchedEval
                tpe = TaskBatchedEval(rec, dp=dp)

                def run_all(tpe=tpe, dp=dp):
                    for batch in dev_groups[dp]:
                        s = tpe.personalise(variables, batch)
                        lg = tpe.predict(variables, s,
                                         batch["query_clips"],
                                         batch["class_mask"])
                    return np.asarray(lg)
            else:
                tpe = TaskParallelEval(rec, mesh=make_mesh(dp))

                def run_all(tpe=tpe, dp=dp):
                    lg = None
                    for g0 in range(0, len(eps), dp):
                        grp = eps[g0:g0 + dp]
                        gqb = qbs[g0:g0 + dp]
                        batch = {k: jnp.asarray(v) for k, v in
                                 stack_eval_group(grp, gqb, dp).items()}
                        s = tpe.personalise(variables, batch)
                        lg = tpe.predict(variables, s, batch["query_clips"],
                                         batch["class_mask"])
                    return np.asarray(lg)

        run_all()  # compile, untimed
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            run_all()
            dt = time.perf_counter() - t0
            best = max(best, args.tasks / dt)
        out["mesh"][dp] = round(best, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
