"""Underscore alias of ``multi-step-learner.py`` (importable module name)."""
from orbit_tpu.learners import MultiStepLearner
from orbit_tpu.utils.args import parse_args


def main():
    MultiStepLearner(parse_args("multi-step-learner")).run()


if __name__ == "__main__":
    main()
