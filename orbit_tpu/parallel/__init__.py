from orbit_tpu.parallel.episode_dp import EpisodeDataParallel, make_mesh
from orbit_tpu.parallel.query_sharding import ShardedQuery

__all__ = ["EpisodeDataParallel", "ShardedQuery", "make_mesh"]
