"""Task-level eval parallelism: the CLU-VE outer loop across mesh lanes.

The protocol's outer loop — 17 users x 50 tasks, each personalise+predict
fully independent (reference: single-step-learner.py:314-357) — is the
embarrassingly-parallel axis with the largest protocol-time win on a mesh.
``--data_parallel`` at eval shards one video's frames
(orbit_tpu/parallel/query_sharding.py); ``--task_parallel N`` instead runs N
whole tasks concurrently, one per mesh lane: each lane personalises on its
own context set and predicts its own stacked query block, with no
collectives at all (the state and logits stay lane-local).

Group assembly: consecutive tasks whose padded episodes share bucket shapes
(context bucket, video-count bucket, frame bucket) are stacked on a leading
task axis; a partial group is filled with duplicate lanes whose outputs the
host discards. Recompilation is bounded by the bucket grid exactly as in
episode-DP training (orbit_tpu/parallel/episode_dp.py).

Per-task metric semantics (reference parity): the batched personalise /
predict dispatches are timed once and divided by the number of real tasks /
real frames in the group — the protocol's "time to personalise per task"
and "inference time per frame" views stay well-defined (PERF.md).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from orbit_tpu.data.episodes import Episode, bucket_size, pad_rows
from orbit_tpu.data.transforms import attach_frame_history
from orbit_tpu.parallel.episode_dp import make_mesh

# video-COUNT buckets: the number of target videos per task varies with way
# and per-object clutter-video counts; bucketing it keeps the stacked query
# block's shape (V_b * F_b) in a small grid
VIDEO_COUNT_BUCKETS = (2, 4, 8, 16, 32, 64, 128, 256)


@dataclass
class QueryBlock:
    """One task's target videos stacked into a single padded query tensor."""

    clips: np.ndarray        # (V_b * F_b, T, H, W, 3) float32
    frame_bucket: int        # F_b
    video_bucket: int        # V_b
    n_videos: int            # real videos
    n_frames: List[int]      # real frames per video (len n_videos)


def build_query_block(ep: Episode, clip_length: int,
                      count_buckets: Sequence[int] = VIDEO_COUNT_BUCKETS
                      ) -> QueryBlock:
    """Stack a test episode's per-video frame stacks into one fixed-shape
    query tensor: per-video frame history (data/transforms.py), videos
    re-padded to the task's max frame bucket, video axis padded to a count
    bucket."""
    f_b = max(f.shape[0] for f in ep.video_frames)
    v_b = bucket_size(len(ep.video_frames), count_buckets)
    clips = [attach_frame_history(pad_rows(frames, f_b), clip_length)
             for frames in ep.video_frames]
    block = np.stack(clips)                      # (V, F_b, T, H, W, 3)
    block = pad_rows(block, v_b)
    return QueryBlock(
        clips=block.reshape(v_b * f_b, *block.shape[2:]),
        frame_bucket=f_b, video_bucket=v_b,
        n_videos=len(ep.video_frames),
        n_frames=[int(m.sum()) for m in ep.video_masks])


def stack_eval_group(episodes: Sequence[Episode],
                     blocks: Sequence[QueryBlock],
                     dp: int) -> Dict[str, np.ndarray]:
    """Stack a group of same-bucket test episodes (and their query blocks)
    on a leading task axis, duplicating the first lane to fill a partial
    group (duplicate lanes' outputs are discarded by the caller)."""
    idx = [min(i, len(episodes) - 1) for i in range(dp)]
    return {
        "context_clips": np.stack([episodes[i].context_clips for i in idx]),
        "context_labels": np.stack([episodes[i].context_labels for i in idx]),
        "context_mask": np.stack([episodes[i].context_mask for i in idx]),
        "class_mask": np.stack([episodes[i].class_mask for i in idx]),
        "query_clips": np.stack([blocks[i].clips for i in idx]),
    }


class _LaneParallel:
    """Shared task-DP scaffold: wrap per-task (personalise, predict)
    callables into jitted shard_map'd GROUP fns. Each lane strips its local
    leading axis (size 1), runs one whole task, and re-stacks with [None];
    the variables enter replicated (P()) and everything else is sharded on
    the task axis. No collectives: nothing crosses lanes.

    Subclasses pass the per-task pair with signatures
    ``personalise_one(variables, clips, labels, mask, class_mask)`` and
    ``predict_one(variables, state, clips, class_mask)``."""

    def __init__(self, mesh: Optional[Mesh], axis: str,
                 personalise_one, predict_one):
        self.mesh = mesh or make_mesh()
        self.axis = axis
        self.dp = self.mesh.devices.size

        def local_personalise(variables, clips, labels, mask, class_mask):
            out = personalise_one(variables, clips[0], labels[0], mask[0],
                                  class_mask[0])
            return jax.tree_util.tree_map(lambda x: x[None], out)

        def local_predict(variables, state, clips, class_mask):
            lane = jax.tree_util.tree_map(lambda x: x[0], state)
            return predict_one(variables, lane, clips[0], class_mask[0])[None]

        self._personalise = jax.jit(jax.shard_map(
            local_personalise, mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis)))
        self._predict = jax.jit(jax.shard_map(
            local_predict, mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=P(axis)))

    def personalise(self, variables, batch: Dict[str, jnp.ndarray]):
        """Batched per-lane task states for a stacked eval group."""
        return self._personalise(variables, batch["context_clips"],
                                 batch["context_labels"],
                                 batch["context_mask"], batch["class_mask"])

    def predict(self, variables, states, query_clips, class_mask):
        """Batched (dp, V_b*F_b, C) logits for the group's query blocks."""
        return self._predict(variables, states, query_clips, class_mask)


def _eval_task_fns(recogniser):
    """Per-task (personalise, predict) pair shared by the mesh (shard_map)
    and single-device (vmap) group runners."""

    def personalise_one(variables, clips, labels, mask, class_mask):
        state = recogniser.personalise(
            variables, clips, labels, mask, class_mask.shape[0],
            train=False, with_grad=False)
        # keep only what predict consumes ("film" may be None; None
        # subtrees are static and stack-free)
        return {"film": state["film"], "head": state["head"]}

    def predict_one(variables, state, clips, class_mask):
        return recogniser.predict(variables, state, clips,
                                  class_mask=class_mask, train=False,
                                  with_grad=False)

    return personalise_one, predict_one


class TaskParallelEval(_LaneParallel):
    """Task-DP for the single-step protocol: one personalise + one stacked
    query predict per lane (reference loop: single-step-learner.py:314-357).
    """

    def __init__(self, recogniser, mesh: Optional[Mesh] = None,
                 axis: str = "dp"):
        personalise_one, predict_one = _eval_task_fns(recogniser)
        super().__init__(mesh, axis, personalise_one, predict_one)


class TaskBatchedEval:
    """Single-DEVICE task grouping: the same bucket-grouped protocol loop as
    :class:`TaskParallelEval`, but the ``dp`` lanes are a vmapped leading
    axis on one chip instead of mesh lanes. One dispatch then covers ``dp``
    whole tasks — amortising per-dispatch overhead and giving XLA a task
    axis to batch the small per-task GEMMs over (head configure, pooling,
    short context chunks), which is where serial small-task eval loses MXU
    fill. Measured on the real v5e (PERF.md "grouped-task eval"); the
    CPU-mesh analog measured 1.5x dispatch amortisation even timeshared on
    one core (round-4 `scripts/bench_task_dp.py`).

    Interface-compatible with TaskParallelEval, so the driver's task-DP
    protocol loop (single_step.py `_run_eval_protocol_taskdp`) uses either
    unchanged: group assembly via ``stack_eval_group(..., dp)``, duplicate
    partial-group lanes discarded by the caller.
    """

    def __init__(self, recogniser, dp: int):
        self.dp = dp
        self._wrap(*_eval_task_fns(recogniser))

    def _wrap(self, personalise_one, predict_one):
        """One place for the vmap axes + jit options (TaskBatchedFineTune
        shares it, so the two single-device paths cannot drift)."""
        self._personalise = jax.jit(jax.vmap(
            personalise_one, in_axes=(None, 0, 0, 0, 0)))
        self._predict = jax.jit(jax.vmap(
            predict_one, in_axes=(None, 0, 0, 0)))

    def personalise(self, variables, batch: Dict[str, jnp.ndarray]):
        """Batched per-task states for a stacked eval group."""
        return self._personalise(variables, batch["context_clips"],
                                 batch["context_labels"],
                                 batch["context_mask"], batch["class_mask"])

    def predict(self, variables, states, query_clips, class_mask):
        """Batched (dp, V_b*F_b, C) logits for the group's query blocks."""
        return self._predict(variables, states, query_clips, class_mask)


class TaskParallelFineTune(_LaneParallel):
    """Task-level parallelism for the FineTuner protocol (multi-step).

    Each mesh lane runs one whole task's INNER GRADIENT LOOP —
    ``personalize_num_grad_steps`` steps of Adam/SGD on its own head/FiLM
    params over its own context set — then predicts its own query block.
    This is the orthogonal axis to ``finetune_dp.ShardedFineTune`` (which
    shards ONE task's context/query rows across the mesh): here nothing
    crosses lanes, so there are no collectives and the per-lane program is
    numerically the serial FineTuner (tests/test_task_parallel.py).

    The inner scans' zero-initialised carries must be pcast to lane-varying
    under strict-vma shard_map (``build_finetune_fns(vary_axis=...)``) —
    otherwise JAX's replication-aware AD would psum the head gradients
    ACROSS tasks, silently averaging different users' personalisation.

    Reference protocol being parallelised: multi-step-learner.py:84-150
    (one task at a time, a fresh model clone + optimiser per task).
    """

    def __init__(self, recogniser, args, mesh: Optional[Mesh] = None,
                 axis: str = "dp"):
        from orbit_tpu.learners.multi_step import build_finetune_fns

        personalise_one, predict_one = build_finetune_fns(
            recogniser, args, jit=False, vary_axis=axis)
        super().__init__(mesh, axis, personalise_one, predict_one)


class TaskBatchedFineTune(TaskBatchedEval):
    """Single-DEVICE task grouping for the FineTuner protocol: ``dp`` whole
    inner gradient loops run as one vmapped dispatch on one chip (vmap of
    the per-task personalise moves the task axis inside the inner scan's
    batched GEMMs). No shard_map, so no vary_axis/pcast plumbing is needed —
    plain vmap batching is collective-free by construction."""

    def __init__(self, recogniser, args, dp: int):
        from orbit_tpu.learners.multi_step import build_finetune_fns

        self.dp = dp
        self._wrap(*build_finetune_fns(recogniser, args, jit=False))
