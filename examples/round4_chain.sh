#!/bin/bash
# Round-4 chip chain (VERDICT r3 #4 + #5): push the in-env R-D ceiling.
#
#   stage A  scaled-up in-env MAE pretrain: 200k steps (was 60k in round 3),
#            RandomResizedCrop(0.2,1.0) + flip over a 4096-crop pool of the
#            22 non-holdout Kodak images (kodim20+kodim23 held out).
#   stage B  keep-{49,100,144} sweep at lambda=1.0 / 40k steps (the round-3
#            protocol, unchanged for comparability) seeded from stage A ->
#            updates the PARITY.md MAE-init recovery table.
#   stage C  native-res-matched checkpoint: keep=144 / lambda=1.0 crop-pool
#            training under serving conventions (canonical order+normalize),
#            seeded from stage A, exported to checkpoints/ for the bench's
#            tiled stage (in-distribution full-res metrics).
#
# Wedged-tunnel recovery: every stage runs in fresh processes under timeout
# with Orbax auto-resume; a kill costs at most one eval interval.
set -u
cd "$(dirname "$0")/.."

MAE_STEPS=${MAE_STEPS:-200000}
SWEEP_STEPS=${SWEEP_STEPS:-40000}
TILED_STEPS=${TILED_STEPS:-75000}
KEEPS=${KEEPS:-"49 100 144"}
mae_npz=/tmp/mae_kodak_r4_rrc.npz
log=/tmp/round4_chain.log

run_with_retries() {  # $1 marker-file  $2... command
  local marker=$1; shift
  for attempt in 1 2 3 4 5 6; do
    [ -f "$marker" ] && return 0
    timeout 9000 "$@" >> "$log" 2>&1 && return 0
    echo "retry $attempt: $*" >> "$log"
    sleep 20
  done
  return 1
}

echo "=== stage A: MAE pretrain ${MAE_STEPS} (rrc+flip) ===" >> "$log"
run_with_retries "$mae_npz" python examples/mae_pretrain_kodak.py \
  --steps "$MAE_STEPS" --pool 4096 --rrc 0.2,1.0 --flip \
  --ckpt-dir /tmp/mae_r4_ckpt --eval-every 25000 --save "$mae_npz" \
  || { echo "stage A FAILED" >> "$log"; exit 1; }

echo "=== stage B: keep sweep from MAE init ===" >> "$log"
for keep in $KEEPS; do
  report=reports/rd_keep${keep}_maeinit_r4.json
  run_with_retries "$report" python examples/rd_sweep.py --keep "$keep" \
    --lmbda 1.0 --steps "$SWEEP_STEPS" --flip --mae-init "$mae_npz" \
    --eval-every 20000 --ckpt-dir "/tmp/r4_sweep_k${keep}" \
    --report "$report" \
    || echo "stage B keep=$keep FAILED" >> "$log"
done

echo "=== stage C: native-res-matched tiled checkpoint ===" >> "$log"
npz=checkpoints/mcm_crop_l1_native.f16.npz
run_with_retries "$npz" python examples/rd_sweep.py --keep 144 --lmbda 1.0 \
  --steps "$TILED_STEPS" --canonical-order --flip --mae-init "$mae_npz" \
  --eval-every 25000 --ckpt-dir /tmp/tiled_ckpt_r4 --save "$npz" \
  --report reports/rd_crop_l1_canonical_r4.json \
  || { echo "stage C FAILED" >> "$log"; exit 1; }
echo "=== chain done ===" >> "$log"
