from orbit_tpu.parallel.episode_dp import EpisodeDataParallel, make_mesh

__all__ = ["EpisodeDataParallel", "make_mesh"]
