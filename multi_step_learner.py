"""Underscore alias of ``multi-step-learner.py``.

Kept deliberately: the reference CLI file name is hyphenated (unimportable);
this module provides the importable entry point for tooling/tests. Both run
the same learner; there is no duplicated logic.
"""
from orbit_tpu.learners import MultiStepLearner
from orbit_tpu.utils.args import parse_args


def main():
    MultiStepLearner(parse_args("multi-step-learner")).run()


if __name__ == "__main__":
    main()
