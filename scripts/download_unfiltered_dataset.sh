#!/bin/bash
# Download + unzip the unfiltered ORBIT dataset (4 ZIPs incl. the "other"
# pool), flatten the mode folders into one tree, then reconstitute benchmark
# users (merge + split).
#
# Usage: bash scripts/download_unfiltered_dataset.sh <dest_root>
# Reference equivalent: scripts/download_unfiltered_dataset.sh.
set -euo pipefail

DEST=${1:?usage: download_unfiltered_dataset.sh <dest_root>}
ROOT="$DEST/orbit_unfiltered"
mkdir -p "$ROOT"

TRAIN_URL=https://city.figshare.com/ndownloader/files/28368339
VALIDATION_URL=https://city.figshare.com/ndownloader/files/28368351
TEST_URL=https://city.figshare.com/ndownloader/files/28368072
OTHER_URL=https://city.figshare.com/ndownloader/files/27456348

for split in train validation test other; do
    url_var="$(echo "$split" | tr '[:lower:]' '[:upper:]')_URL"
    echo "downloading ${split}.zip..."
    wget -O "$ROOT/${split}.zip" "${!url_var}"
    echo "unzipping ${split}.zip..."
    unzip -q "$ROOT/${split}.zip" -d "$ROOT"
    rm "$ROOT/${split}.zip"
done

# flatten mode folders: move P* user dirs up to the root
for split in train validation test; do
    if [ -d "$ROOT/$split" ]; then
        mv "$ROOT/$split"/P* "$ROOT/" 2>/dev/null || true
        rmdir "$ROOT/$split" 2>/dev/null || true
    fi
done

python3 "$(dirname "$0")/merge_and_split_benchmark_users.py" \
    --data_path "$ROOT" \
    --split_json "$(dirname "$0")/../data/orbit_benchmark_users_to_split.json"
echo "unfiltered dataset saved to $ROOT"
