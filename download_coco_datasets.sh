#!/usr/bin/env bash
# Fetch the COCO images + caption annotations this stack trains on, into the
# layout config.yml expects (same data layout as the reference stack):
#
#   coco_data/train2017/           118k training images
#   coco_data/val2017/             5k validation images
#   coco_data/val2014/             40.5k images (held-out "test" split)
#   coco_data/annotations/         captions_{train2017,val2017,train2014,val2014}.json
#   coco_data/embeddings/          (created empty; extractors write here)
#
# Run on a machine with network access.  ~26 GB total.
set -euo pipefail

DATA_DIR="${1:-coco_data}"
BASE_IMG="http://images.cocodataset.org"

mkdir -p "$DATA_DIR" "$DATA_DIR/annotations" "$DATA_DIR/embeddings" "$DATA_DIR/checkpoints"
cd "$DATA_DIR"

fetch_zip () {
    local url="$1" marker="$2"
    if [ -d "$marker" ]; then
        echo "== $marker already present, skipping"
        return
    fi
    local zip
    zip="$(basename "$url")"
    echo "== downloading $zip"
    curl -fL -C - -o "$zip" "$url"
    echo "== extracting $zip"
    unzip -q "$zip"
    rm -f "$zip"
}

fetch_zip "$BASE_IMG/zips/train2017.zip" train2017
fetch_zip "$BASE_IMG/zips/val2017.zip" val2017
fetch_zip "$BASE_IMG/zips/val2014.zip" val2014

if [ ! -f annotations/captions_train2017.json ]; then
    echo "== downloading 2017 annotations"
    curl -fL -o ann2017.zip "$BASE_IMG/annotations/annotations_trainval2017.zip"
    unzip -q -o ann2017.zip "annotations/captions_*"
    rm -f ann2017.zip
fi
if [ ! -f annotations/captions_val2014.json ]; then
    echo "== downloading 2014 annotations"
    curl -fL -o ann2014.zip "$BASE_IMG/annotations/annotations_trainval2014.zip"
    unzip -q -o ann2014.zip "annotations/captions_*"
    rm -f ann2014.zip
fi

echo "COCO data ready under $DATA_DIR/"
