"""Underscore alias of ``single-step-learner.py`` (importable module name)."""
from orbit_tpu.learners import SingleStepLearner
from orbit_tpu.utils.args import parse_args


def main():
    SingleStepLearner(parse_args("single-step-learner")).run()


if __name__ == "__main__":
    main()
