#!/usr/bin/env bash
# Canonical MCM training config (parity with /root/reference/train.sh:1-11):
# 224^2 inputs, keep 144/196 patches, batch 32, lr 1e-4, lambda 1e-4, 1000 epochs.
set -euo pipefail
DATASET=${1:?usage: train.sh <dataset_root> [extra flags...]}
shift || true
python -m textmae_tpu.cli.train \
    -d "$DATASET" \
    --epochs 1000 \
    --batch-size 32 \
    --learning-rate 1e-4 \
    --aux-learning-rate 1e-3 \
    --lmbda 1e-4 \
    --input-size 224 \
    --num-keep-patches 144 \
    --bf16 \
    "$@"
