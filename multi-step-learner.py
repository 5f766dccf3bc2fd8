#!/usr/bin/env python
"""Test-only driver for gradient-based personalisation (FineTuner),
TPU-native.

Reference equivalent: multi-step-learner.py (same CLI flags, including the
personalize_* finetuning group). Example:

    python multi-step-learner.py --data_path /data/orbit_benchmark_224 \
        --feature_extractor efficientnet_b0 --classifier linear \
        --mode test --personalize_num_grad_steps 50
"""
from orbit_tpu.learners import MultiStepLearner
from orbit_tpu.utils.args import parse_args


def main():
    learner = MultiStepLearner(parse_args("multi-step-learner"))
    learner.run()


if __name__ == "__main__":
    main()
