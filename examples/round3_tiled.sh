#!/bin/bash
# Round-3 continuation: a crop-pool-trained checkpoint whose training
# distribution MATCHES native-resolution tiles (random 224^2 crops of the
# 22 non-holdout full-res Kodak images), under this framework's serving
# conventions (canonical keep order + normalize), lambda=1.0 / keep=144.
#
# Purpose: the bench's tiled stage measures true full-res compression; the
# committed Quicktest-protocol checkpoints trained on DOWNSCALED-224 images,
# so native-res tiles are out-of-distribution for them (13.6 dB). This run
# gives (a) an in-distribution tiled number and (b) native-res holdout
# GENERALIZATION (kodim20+kodim23 never seen at any resolution).
#
# Same wedged-tunnel recovery pattern as round3_rate3.sh: fresh process per
# attempt under `timeout`, auto-resume from the newest Orbax step dir.
set -u
cd "$(dirname "$0")/.."

steps=${TILED_STEPS:-100000}
log=/tmp/tiled_train.log
npz=checkpoints/mcm_crop_l1_native.f16.npz
for attempt in 1 2 3 4 5 6 7 8; do
  [ -f "$npz" ] && { echo "tiled ckpt done"; exit 0; }
  timeout 7200 python examples/rd_sweep.py --keep 144 --lmbda 1.0 \
    --steps "$steps" --canonical-order --flip --eval-every 25000 \
    --ckpt-dir /tmp/tiled_ckpt --save "$npz" \
    --report reports/rd_crop_l1_canonical.json >> "$log" 2>&1
  echo "rc=$?" >> "$log"
  sleep 20
done
[ -f "$npz" ] || { echo "tiled ckpt FAILED after retries" | tee -a "$log"; exit 1; }
