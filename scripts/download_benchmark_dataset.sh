#!/bin/bash
# Download + unzip the ORBIT benchmark dataset (train/validation/test ZIPs
# from FigShare), optionally resizing to a non-224 frame size.
#
# Usage: bash scripts/download_benchmark_dataset.sh <dest_root> <frame_size>
# Reference equivalent: scripts/download_benchmark_dataset.sh (same FigShare
# file ids).
set -euo pipefail

DEST=${1:?usage: download_benchmark_dataset.sh <dest_root> <frame_size>}
FRAME_SIZE=${2:-224}

if [ "$FRAME_SIZE" = 224 ]; then
    TRAIN_URL=https://city.figshare.com/ndownloader/files/28368339
    VALIDATION_URL=https://city.figshare.com/ndownloader/files/28368351
    TEST_URL=https://city.figshare.com/ndownloader/files/28368072
    ROOT="$DEST/orbit_benchmark_224"
else
    TRAIN_URL=https://city.figshare.com/ndownloader/files/27189155
    VALIDATION_URL=https://city.figshare.com/ndownloader/files/27188237
    TEST_URL=https://city.figshare.com/ndownloader/files/27346766
    ROOT="$DEST/orbit_benchmark"
fi

mkdir -p "$ROOT"
for split in train validation test; do
    url_var="$(echo "$split" | tr '[:lower:]' '[:upper:]')_URL"
    echo "downloading ${split}.zip..."
    wget -O "$ROOT/${split}.zip" "${!url_var}"
    echo "unzipping ${split}.zip..."
    unzip -q "$ROOT/${split}.zip" -d "$ROOT"
    rm "$ROOT/${split}.zip"
done
echo "benchmark dataset saved to $ROOT"

if [ "$FRAME_SIZE" != 224 ]; then
    echo "resizing video frames to ${FRAME_SIZE}x${FRAME_SIZE}..."
    python3 "$(dirname "$0")/resize_videos.py" --data_path "$ROOT" \
        --save_path "${ROOT}_${FRAME_SIZE}" --size "$FRAME_SIZE" --nthreads 12
fi
