#!/usr/bin/env bash
# Fetch the reference pretrained checkpoints into save_models/ (the
# loader imports torch .pth state dicts directly; counterpart of the
# reference scripts/get_model.sh which pulled from Google Drive into a
# directory the code never read from).
set -euo pipefail

DEST="${1:-save_models}"
mkdir -p "$DEST"

# Reference weights are distributed via Google Drive:
#   CRNN.pth  https://drive.google.com/open?id=15RZ1M9VBW0Bp-W9G6KEfqOnPVWF6skPM
#   CRAFT.pth https://drive.google.com/open?id=1rOzsNS1yzVambGq7kRmEUpJ_PSrzGbnT
# gdown handles the confirmation dance when available.
fetch() {
  local id="$1" out="$2"
  if command -v gdown >/dev/null; then
    gdown "https://drive.google.com/uc?id=${id}" -O "$out"
  else
    curl -L "https://drive.google.com/uc?export=download&id=${id}" -o "$out"
  fi
}

fetch 15RZ1M9VBW0Bp-W9G6KEfqOnPVWF6skPM "$DEST/CRNN.pth"
fetch 1rOzsNS1yzVambGq7kRmEUpJ_PSrzGbnT "$DEST/CRAFT.pth"
echo "weights in $DEST/"
