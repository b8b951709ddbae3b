#!/usr/bin/env bash
# MJSynth (Synth90k) download + record conversion (counterpart of the
# reference scripts/download_mjsynth.sh, which only untarred it).
set -euo pipefail

DEST="${1:-data/mjsynth}"
mkdir -p "$DEST"
URL="https://thor.robots.ox.ac.uk/~vgg/data/text/mjsynth.tar.gz"

curl -L "$URL" -o "$DEST/mjsynth.tar.gz"
tar -xzf "$DEST/mjsynth.tar.gz" -C "$DEST" --strip-components=1
python -m lightly_ocr_tpu.data.generator mjsynth "$DEST" data/train/data.lor \
    --annotation annotation_train.txt
python -m lightly_ocr_tpu.data.generator mjsynth "$DEST" data/val/data.lor \
    --annotation annotation_val.txt
echo "records in data/train and data/val"
