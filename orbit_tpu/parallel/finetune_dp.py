"""Within-task data parallelism for the FineTuner protocol (multi-step).

The reference finetunes each task on one GPU: ``num_grad_steps`` epochs of
batched gradient descent over the context set, then per-video prediction
(multi-step-learner.py:157-184, model/few_shot_recognisers.py:207-258). On
a TPU mesh both halves are data-parallel WITHIN one task:

- **personalise**: the per-step gradient is the sum of per-batch gradients
  over the whole context set (the reference's per-batch means scaled by
  ``batch_len/total`` and summed), so it is invariant to how rows are
  grouped — shard the context rows across chips and the mesh-summed
  gradient is numerically the serial one. The only global quantity is the
  ``total`` valid-row normaliser (a psum). The inner scan's carry
  (task_params, optimiser state) stays mesh-UNVARYING: ``jax.grad`` of an
  unvarying pytree against device-varying data auto-psums the cotangent at
  the pvary insertion point (the same JAX 0.9 replication-aware AD that
  episode_dp.py relies on), so every lane applies the identical update and
  no explicit gradient collective appears in this file.
- **predict**: the query axis is embarrassingly parallel, exactly like the
  single-step eval path (query_sharding.py), but through the FineTuner's
  ``task_logits``.

This keeps the CLU-VE protocol semantics intact — per-task personalise
timing and MACs are unchanged in meaning; the task simply uses the whole
mesh instead of one chip.

    ft = ShardedFineTune(recogniser, args, mesh=make_mesh(8))
    task_params = ft.personalise(variables, ctx_clips, ctx_labels,
                                 ctx_mask, class_mask)
    logits = ft.predict(variables, task_params, clips, class_mask)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from orbit_tpu.parallel.episode_dp import make_mesh, pad_rows_to_multiple


class ShardedFineTune:
    def __init__(self, recogniser, args, mesh: Optional[Mesh] = None,
                 axis: str = "dp"):
        from orbit_tpu.learners.multi_step import build_finetune_fns

        self.mesh = mesh or make_mesh(getattr(args, "data_parallel", None))
        self.axis = axis
        self.num_shards = self.mesh.devices.size

        local_personalise, local_predict = build_finetune_fns(
            recogniser, args, mesh_axis=axis, jit=False)

        self._personalise = jax.jit(jax.shard_map(
            local_personalise, mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P()),
            out_specs=P(),
        ))
        self._predict = jax.jit(jax.shard_map(
            local_predict, mesh=self.mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=P(axis),
        ))

    def _pad(self, x: jnp.ndarray) -> jnp.ndarray:
        return pad_rows_to_multiple(x, self.num_shards)

    def personalise(self, variables, ctx_clips, ctx_labels, ctx_mask,
                    class_mask):
        """Shard the context rows over the mesh; rows are padded up to a
        multiple of the mesh size with zero-mask rows (excluded from the
        loss and from the global ``total`` normaliser; the backbone runs
        eval-mode BN here, so pad rows touch no statistics)."""
        return self._personalise(
            variables, self._pad(ctx_clips), self._pad(ctx_labels),
            self._pad(ctx_mask), class_mask)

    def predict(self, variables, task_params, clips, class_mask):
        """Shard ``clips`` (N, T, H, W, 3) over the mesh; N padded up to a
        multiple of the mesh size (padded logits sliced off)."""
        n = clips.shape[0]
        logits = self._predict(variables, task_params, self._pad(clips),
                               class_mask)
        return logits[:n]
