#!/usr/bin/env python
"""Generate golden-activation fingerprints for the pinned pretrained weights.

The reference constructs its backbones from five pinned checkpoints
(reference: model/feature_extractors.py:37-79 — timm tf_efficientnet_b0 /
tf_efficientnetv2_s_in21k / vit_small_patch32_224 / vit_base_patch32_224 and
OpenAI CLIP ViT-B/32). Our parity tests run the converted Flax model against
an independent torch reimplementation with *fabricated* weights; if both
share a misunderstanding of timm, they self-confirm. This script closes that
hole: run it ONCE in an environment with the real checkpoints (network +
optionally timm installed) and commit the resulting JSON under
``data/fingerprints/``. ``tests/test_fingerprints.py`` then asserts the Flax
forward reproduces the recorded activations whenever the state dict is
available locally.

Usage (single backbone):
    python scripts/make_activation_fingerprints.py \
        --backbone efficientnet_b0 \
        --state_dict path/to/tf_efficientnet_b0_aa-827b6e33.pth \
        [--timm_name tf_efficientnet_b0]   # also record timm's own output

Usage (all five pinned checkpoints in one run, as fetched by
scripts/download_pretrained.sh):
    python scripts/make_activation_fingerprints.py --state_dict_dir pretrained/

The fingerprint records: backbone, input seed/shape, the state dict's SHA256,
and the first 32 values of the pooled feature vector for 2 seeded frames —
from the converted Flax model, and (when timm is importable) from the
genuine timm model as ground truth.
"""
import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAME_SIZE = 224
N_VALUES = 32


def seeded_input(seed: int = 0, n: int = 2):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, FRAME_SIZE, FRAME_SIZE, 3)).astype(np.float32)


# the five pinned checkpoints (reference: model/feature_extractors.py:37-79):
# backbone -> (filename fetched by scripts/download_pretrained.sh, timm name)
PINNED = {
    "efficientnet_b0": ("tf_efficientnet_b0_aa-827b6e33.pth",
                        "tf_efficientnet_b0"),
    "efficientnet_v2_s": ("tf_efficientnetv2_s_21k-6337ad01.pth",
                          "tf_efficientnetv2_s_in21k"),
    "vit_s_32": ("S_32-i21k-300ep-lr_0.001-aug_light1-wd_0.03-do_0.0-sd_0.0.npz",
                 "vit_small_patch32_224_in21k"),
    "vit_b_32": ("B_32-i21k-300ep-lr_0.001-aug_medium1-wd_0.03-do_0.0-sd_0.0.npz",
                 "vit_base_patch32_224_in21k"),
    "vit_b_32_clip": ("open_clip_pytorch_model.bin",
                      "vit_base_patch32_224_clip_laion2b"),
}


def fingerprint_one(backbone, state_dict_path, timm_name, out_dir, seed=0):
    import jax

    from orbit_tpu.models.backbones import create_feature_extractor
    from orbit_tpu.models.convert import convert_extractor, load_torch_state_dict

    with open(state_dict_path, "rb") as f:
        sd_sha = hashlib.sha256(f.read()).hexdigest()
    sd = load_torch_state_dict(state_dict_path)
    params, stats = convert_extractor(sd, backbone)

    x = seeded_input(seed)
    module, _, _ = create_feature_extractor(backbone)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    flax_out = np.asarray(jax.jit(lambda v, x: module.apply(v, x))(
        jax.tree_util.tree_map(np.asarray, variables), x))

    record = {
        "backbone": backbone,
        "input_seed": seed,
        "input_shape": list(x.shape),
        "state_dict_sha256": sd_sha,
        "state_dict_basename": os.path.basename(state_dict_path),
        "flax_features": flax_out[:, :N_VALUES].tolist(),
    }

    if timm_name:
        try:
            import timm
            import torch
            model = timm.create_model(timm_name, pretrained=False, num_classes=0)
            model.load_state_dict(
                {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
            model.eval()
            with torch.no_grad():
                t_out = model(torch.as_tensor(x).permute(0, 3, 1, 2)).numpy()
            record["timm_features"] = t_out[:, :N_VALUES].tolist()
            drift = float(np.abs(t_out - flax_out).max())
            record["timm_vs_flax_max_abs"] = drift
            print(f"timm vs flax max abs diff: {drift:.3e}")
        except ImportError:
            print("timm/torch not importable; recording flax-only fingerprint")

    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"{backbone}.json")
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {out_path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default=None)
    p.add_argument("--state_dict", default=None,
                   help="torch .pth/.bin (or augreg .npz / open_clip .bin) "
                        "checkpoint with the pinned pretrained weights")
    p.add_argument("--state_dict_dir", default=None,
                   help="directory holding the five pinned checkpoints (as "
                        "fetched by scripts/download_pretrained.sh); emits "
                        "every available fingerprint in one run")
    p.add_argument("--timm_name", default=None,
                   help="timm model name; if given and timm is importable, "
                        "also record the genuine timm forward as ground truth")
    p.add_argument("--out_dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "fingerprints"))
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()

    if a.state_dict_dir:
        missing = []
        for backbone, (fname, timm_name) in PINNED.items():
            path = os.path.join(a.state_dict_dir, fname)
            if not os.path.exists(path):
                missing.append(fname)
                continue
            print(f"== {backbone} ({fname})")
            fingerprint_one(backbone, path, a.timm_name or timm_name,
                            a.out_dir, a.seed)
        if missing:
            print(f"skipped (not downloaded): {', '.join(missing)}")
        return
    if not (a.backbone and a.state_dict):
        p.error("pass --state_dict_dir, or both --backbone and --state_dict")
    timm_name = a.timm_name or PINNED.get(a.backbone, (None, None))[1]
    fingerprint_one(a.backbone, a.state_dict, timm_name, a.out_dir, a.seed)


if __name__ == "__main__":
    main()
