from orbit_tpu.parallel.episode_dp import EpisodeDataParallel, make_mesh
from orbit_tpu.parallel.finetune_dp import ShardedFineTune
from orbit_tpu.parallel.query_sharding import ShardedQuery
from orbit_tpu.parallel.task_dp import (
    TaskBatchedEval, TaskBatchedFineTune, TaskParallelEval,
    TaskParallelFineTune)

__all__ = ["EpisodeDataParallel", "ShardedFineTune", "ShardedQuery",
           "TaskBatchedEval", "TaskBatchedFineTune", "TaskParallelEval",
           "TaskParallelFineTune", "make_mesh"]
