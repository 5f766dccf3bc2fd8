#!/usr/bin/env python
"""Train/validate/test driver for single-step personalisation models
(ProtoNets, CNAPs, SimpleCNAPs), TPU-native.

Reference equivalent: single-step-learner.py (same CLI flags; see
orbit_tpu/utils/args.py). Example:

    python single-step-learner.py --data_path /data/orbit_benchmark_224 \
        --feature_extractor efficientnet_b0 --classifier proto \
        --adapt_features --with_lite --mode train_test
"""
from orbit_tpu.learners import SingleStepLearner
from orbit_tpu.utils.args import parse_args


def main():
    learner = SingleStepLearner(parse_args("single-step-learner"))
    learner.run()


if __name__ == "__main__":
    main()
