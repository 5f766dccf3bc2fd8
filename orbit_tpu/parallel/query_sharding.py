"""Within-task query-batch sharding for inference (SURVEY.md §2.9 item 2).

The reference streams query clips through the backbone in a Python batch
loop on one GPU (few_shot_recognisers.py:124-153). On a TPU mesh the query
axis is embarrassingly parallel: shard the (padded) frame axis across chips
with ``shard_map`` — each chip embeds its slice under the (replicated)
personalised task state and emits its slice of logits; no collectives are
needed.

    sq = ShardedQuery(recogniser, mesh)
    logits = sq.predict(variables, task_state, clips, class_mask)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from orbit_tpu.parallel.episode_dp import make_mesh, pad_rows_to_multiple


class ShardedQuery:
    def __init__(self, recogniser, mesh: Optional[Mesh] = None, axis: str = "dp"):
        self.mesh = mesh or make_mesh()
        self.axis = axis
        n = self.mesh.devices.size

        def local_predict(variables, task_state, clips, class_mask):
            return recogniser.predict(variables, task_state, clips,
                                      class_mask=class_mask, train=False,
                                      with_grad=False)

        self._predict = jax.jit(jax.shard_map(
            local_predict, mesh=self.mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=P(axis),
        ))
        self.num_shards = n

    def predict(self, variables, task_state, clips: jnp.ndarray,
                class_mask: jnp.ndarray) -> jnp.ndarray:
        """Shard ``clips`` (N, T, H, W, 3) over the mesh; N is padded up to a
        multiple of the mesh size (padded logits are sliced off)."""
        n = clips.shape[0]
        clips = pad_rows_to_multiple(clips, self.num_shards)
        logits = self._predict(variables, task_state, clips, class_mask)
        return logits[:n]
