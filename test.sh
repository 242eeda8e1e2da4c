#!/usr/bin/env bash
# Canonical MCM eval config (parity with /root/reference/test.sh):
# per-image real-bitstream inference with the JSON metrics report.
set -euo pipefail
DATASET=${1:?usage: test.sh <test_image_dir> <checkpoint> [extra flags...]}
CKPT=${2:?usage: test.sh <test_image_dir> <checkpoint> [extra flags...]}
shift 2 || true
python -m textmae_tpu.cli.test_model \
    -d "$DATASET" \
    -p "$CKPT" \
    --num-keep-patches 144 \
    --save-recon \
    -v \
    "$@"
