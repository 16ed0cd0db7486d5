#!/usr/bin/env bash
# Download + prepare the Criteo Display Advertising (Kaggle) dataset for
# the quality-anchor run (xDeepFM paper, cited in the reference README:
# AUC ~0.8052 / logloss ~0.4418 on this dataset).
#
# This environment has zero egress, so the download cannot run here —
# the script documents the exact recipe for a connected machine.
#
# Usage: tools/get_criteo.sh [DEST_DIR]   (default ./data/criteo)
#
# After download, train + evaluate against the paper anchor:
#
#   # last 6.5% of rows as the test split (standard practice: the data is
#   # time-ordered; ~45.8M rows total)
#   python -m recman_tpu.examples.criteo_xdeepfm \
#       --tsv data/criteo/train.txt --rows 42000000 \
#       --num-buckets 1000000 --epoch 1 --batch-size 8192
#
#   # or stream it without whole-dataset residency (bounded HBM):
#   #   recman_tpu.data.iter_criteo_chunks + Trainer.fit_stream
#
# Expected: valid AUC in the ~0.80 band at 1 epoch with k=16,
# CIN (100,100), DNN (400,400) — the paper anchor's config family.
set -euo pipefail

DEST="${1:-./data/criteo}"
mkdir -p "$DEST"

# Criteo research mirror of the Kaggle challenge dataset (~4.3 GB tar.gz;
# unpacks to train.txt ~11 GB, test.txt, readme).
URL="https://go.criteo.net/criteo-research-kaggle-display-advertising-challenge-dataset.tar.gz"

if [ -f "$DEST/train.txt" ]; then
  echo "train.txt already present in $DEST"
  exit 0
fi

echo "downloading Kaggle Criteo dataset to $DEST ..."
if command -v curl >/dev/null; then
  curl -L --retry 3 -o "$DEST/criteo_kaggle.tar.gz" "$URL"
else
  wget -O "$DEST/criteo_kaggle.tar.gz" "$URL"
fi

echo "unpacking ..."
tar -xzf "$DEST/criteo_kaggle.tar.gz" -C "$DEST"
rm -f "$DEST/criteo_kaggle.tar.gz"
ls -l "$DEST"
echo "done. Train with:"
echo "  python -m recman_tpu.examples.criteo_xdeepfm --tsv $DEST/train.txt"
