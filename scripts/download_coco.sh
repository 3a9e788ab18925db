#!/usr/bin/env bash
# COCO 2017 image + annotation acquisition, then COCONUT relabeled-mask
# conversion. Role parity with the reference's src/download_coco.sh:16-60
# (wget/unzip train/val/test + annotations; invoke the COCONUT converter).
#
# Usage: scripts/download_coco.sh <dataset_root> [splits...]
#   splits default: val2017 train2017 (test2017 optional; annotations always)
#
# Produces the layout the pipeline loaders expect:
#   <dataset_root>/images/{split}/NNNNNNNNNNNN.jpg
#   <dataset_root>/annotations/coconut_{val,train}.json

set -euo pipefail

ROOT=${1:?usage: download_coco.sh <dataset_root> [splits...]}
shift || true
SPLITS=("${@:-val2017 train2017}")
[ $# -eq 0 ] && SPLITS=(val2017 train2017)

mkdir -p "$ROOT/images" "$ROOT/annotations" "$ROOT/zips"

fetch_unzip() {
  local url=$1 dest=$2
  local zip="$ROOT/zips/$(basename "$url")"
  if [ ! -f "$zip" ]; then
    echo ">> downloading $url"
    wget -c -q --show-progress -O "$zip" "$url"
  fi
  echo ">> extracting $(basename "$zip")"
  unzip -q -n "$zip" -d "$dest"
}

for split in "${SPLITS[@]}"; do
  if [ ! -d "$ROOT/images/$split" ]; then
    fetch_unzip "http://images.cocodataset.org/zips/${split}.zip" "$ROOT/images"
  else
    echo ">> $split already present, skipping"
  fi
done

if [ ! -f "$ROOT/annotations/instances_val2017.json" ]; then
  fetch_unzip "http://images.cocodataset.org/annotations/annotations_trainval2017.zip" "$ROOT"
fi

# COCONUT relabeled instance masks (HF xdeng77/*), converted to the
# instance-format JSON the loaders read (data/panoptic.py::download_coconut,
# parity: reference download_coconut.py:204-332).
for split in relabeled_coco_val coconut_s; do
  python - "$split" "$ROOT/annotations" <<'PY'
import sys
from labelany3d_tpu.data.panoptic import download_coconut

split, outdir = sys.argv[1], sys.argv[2]
try:
    path = download_coconut(split, outdir)
    print(f">> wrote {path}")
except Exception as e:  # no network in air-gapped runs: leave a clear note
    print(f">> COCONUT {split} conversion skipped: {e}", file=sys.stderr)
PY
done

echo "done: $ROOT"
