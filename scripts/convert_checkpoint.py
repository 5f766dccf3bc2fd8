#!/usr/bin/env python
"""Convert a pinned timm/torch backbone checkpoint into a TPU-native
extractor checkpoint loadable with ``--pretrained_extractor_path``.

Reference equivalent: the automatic timm download in
model/feature_extractors.py:37-79 (URLs pinned there; download the .pth with
those URLs, then convert offline):

    python scripts/convert_checkpoint.py \
        --feature_extractor efficientnet_b0 \
        --torch_path tf_efficientnet_b0_aa-827b6e33.pth \
        --out pretrained/efficientnet_b0.ckpt
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orbit_tpu.models.convert import (convert_extractor, load_torch_state_dict,
                                      save_converted)
from orbit_tpu.utils.args import FEATURE_EXTRACTORS


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--feature_extractor", required=True, choices=FEATURE_EXTRACTORS)
    p.add_argument("--torch_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--full_model", action="store_true",
                   help="Input is a full reference recogniser checkpoint "
                        "(e.g. the published protonets_*.pt) rather than a "
                        "bare timm backbone; emits variables loadable with "
                        "--model_path.")
    p.add_argument("--classifier", default="proto",
                   choices=["linear", "versa", "proto", "proto_cosine", "mahalanobis"],
                   help="(--full_model) classifier the checkpoint was trained with.")
    p.add_argument("--adapt_features", action="store_true",
                   help="(--full_model) checkpoint includes FiLM generator + set encoder.")
    args = p.parse_args()

    sd = load_torch_state_dict(args.torch_path)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    if args.full_model:
        import jax

        from orbit_tpu.models.convert import convert_recogniser_checkpoint
        from orbit_tpu.models.recognisers import SingleStepFewShotRecogniser
        from orbit_tpu.utils.checkpoint import save_checkpoint

        rec = SingleStepFewShotRecogniser(
            feature_extractor_name=args.feature_extractor,
            adapt_features=args.adapt_features, classifier=args.classifier)
        variables = rec.init(jax.random.PRNGKey(0))
        save_checkpoint(args.out, convert_recogniser_checkpoint(sd, rec, variables))
    else:
        params, batch_stats = convert_extractor(sd, args.feature_extractor)
        save_converted(args.out, params, batch_stats)
    print(f"converted {len(sd)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
