#!/bin/bash
# Download the five pinned pretrained extractor checkpoints.
#
# URLs are the exact ones the reference pins at model construction
# (reference: model/feature_extractors.py:37-79); this repo converts them
# offline instead of downloading inside the model factory:
#
#   bash scripts/download_pretrained.sh [DEST_DIR]
#   python scripts/make_activation_fingerprints.py --state_dict_dir DEST_DIR
#   python scripts/convert_checkpoint.py --feature_extractor vit_b_32 \
#       --torch_path DEST_DIR/B_32-i21k-...npz --out vit_b_32.ckpt
#
# Integrity: each file's SHA256 is checked against data/pretrained_sha256.lock
# when that file lists it; on first download of an unlisted file the hash is
# appended so later fetches are pinned. (The lock ships empty: this sandbox
# has no network, so the hashes could not be recorded at build time.)
set -euo pipefail

DEST="${1:-pretrained}"
LOCK="$(dirname "$0")/../data/pretrained_sha256.lock"
mkdir -p "$DEST"
touch "$LOCK"

# name|filename|url  (reference: model/feature_extractors.py:37-79)
MANIFEST='
efficientnet_b0|tf_efficientnet_b0_aa-827b6e33.pth|https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-weights/tf_efficientnet_b0_aa-827b6e33.pth
efficientnet_v2_s|tf_efficientnetv2_s_21k-6337ad01.pth|https://github.com/rwightman/pytorch-image-models/releases/download/v0.1-effv2-weights/tf_efficientnetv2_s_21k-6337ad01.pth
vit_s_32|S_32-i21k-300ep-lr_0.001-aug_light1-wd_0.03-do_0.0-sd_0.0.npz|https://storage.googleapis.com/vit_models/augreg/S_32-i21k-300ep-lr_0.001-aug_light1-wd_0.03-do_0.0-sd_0.0.npz
vit_b_32|B_32-i21k-300ep-lr_0.001-aug_medium1-wd_0.03-do_0.0-sd_0.0.npz|https://storage.googleapis.com/vit_models/augreg/B_32-i21k-300ep-lr_0.001-aug_medium1-wd_0.03-do_0.0-sd_0.0.npz
vit_b_32_clip|open_clip_pytorch_model.bin|https://huggingface.co/laion/CLIP-ViT-B-32-laion2B-s34B-b79K/resolve/main/open_clip_pytorch_model.bin
'

echo "$MANIFEST" | while IFS='|' read -r name file url; do
    [ -z "$name" ] && continue
    out="$DEST/$file"
    if [ ! -f "$out" ]; then
        echo "downloading $name -> $out"
        # delete partial/empty output on any failure so a dead network
        # can't pin a bogus hash into the lock on a later run
        if ! wget -q --show-progress -O "$out" "$url" || [ ! -s "$out" ]; then
            rm -f "$out"
            echo "ERROR: download failed for $name ($url)" >&2
            exit 1
        fi
    else
        echo "$name already present: $out"
    fi
    sha="$(sha256sum "$out" | cut -d' ' -f1)"
    pinned="$(grep -E "^$file " "$LOCK" | cut -d' ' -f2 || true)"
    if [ -n "$pinned" ]; then
        if [ "$sha" != "$pinned" ]; then
            echo "ERROR: $file sha256 $sha != pinned $pinned" >&2
            exit 1
        fi
        echo "  sha256 OK ($sha)"
    else
        echo "$file $sha" >> "$LOCK"
        echo "  sha256 recorded: $sha"
    fi
done
echo "done. convert with scripts/convert_checkpoint.py, then verify with"
echo "scripts/make_activation_fingerprints.py --state_dict_dir $DEST"
