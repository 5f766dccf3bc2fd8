from orbit_tpu.learners.single_step import SingleStepLearner
from orbit_tpu.learners.multi_step import MultiStepLearner

__all__ = ["SingleStepLearner", "MultiStepLearner"]
