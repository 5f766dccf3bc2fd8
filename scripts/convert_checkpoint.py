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
    args = p.parse_args()

    sd = load_torch_state_dict(args.torch_path)
    params, batch_stats = convert_extractor(sd, args.feature_extractor)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_converted(args.out, params, batch_stats)
    print(f"converted {len(sd)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
