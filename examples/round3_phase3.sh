#!/bin/bash
# Round-3 phase 3: complete the MAE-init R-D curve across all three mask
# ratios (phase 2 measured keep=49 only). Run unattended on the chip:
#
#   1. re-pretrain the in-env MAE-base on the 22 non-holdout Kodak crops
#      (the phase-2 /tmp checkpoint does not survive box recycling).
#   2. rd_sweep --mae-init at keep=100 and keep=144 (same protocol as the
#      committed from-scratch sweeps: reference ordering, lambda=1.0,
#      40k steps, flip-augmented crop pools).
#   3. dual-accounting holdout evals for both checkpoints.
#
# Stages retry in fresh processes under `timeout` and auto-resume from the
# newest checkpoint (same wedged-tunnel contract as round3_chain.sh).
set -u
cd "$(dirname "$0")/.."
mkdir -p reports

MAE_STEPS=${MAE_STEPS:-60000}
SWEEP_STEPS=${SWEEP_STEPS:-40000}

retry_train() {  # retry_train <n> <timeout_s> <log> <done_file> <cmd...>
  local n=$1 t=$2 log=$3 done_file=$4; shift 4
  for attempt in $(seq 1 "$n"); do
    [ -f "$done_file" ] && return 0
    echo "=== attempt $attempt: $* $(date)" | tee -a "$log"
    timeout "$t" "$@" >> "$log" 2>&1
    echo "rc=$?" >> "$log"
    sleep 20
  done
  [ -f "$done_file" ] && return 0
  echo "FAILED after $n attempts: $*" | tee -a "$log"
  return 1
}

# 1. MAE-base pretrain (auto-resumes from --ckpt-dir)
retry_train 6 5400 /tmp/mae_pretrain.log /tmp/mae_kodak.f16.npz \
  python examples/mae_pretrain_kodak.py --steps "$MAE_STEPS" --flip \
    --ckpt-dir /tmp/mae_ckpt --save /tmp/mae_kodak.f16.npz || exit 1

# 2. MAE-init sweeps at the two remaining mask ratios
for k in 100 144; do
  retry_train 6 5400 /tmp/rd_maeinit_k${k}.log reports/rd_keep${k}_maeinit.json \
    python examples/rd_sweep.py --keep "$k" --lmbda 1.0 \
      --steps "$SWEEP_STEPS" --flip --mae-init /tmp/mae_kodak.f16.npz \
      --ckpt-dir /tmp/rd_ckpt_maeinit_k${k} \
      --report reports/rd_keep${k}_maeinit.json \
      --save /tmp/rd_keep${k}_maeinit.f16.npz
done

# 3. dual-accounting holdout evals
for k in 100 144; do
  npz=/tmp/rd_keep${k}_maeinit.f16.npz
  [ -f "$npz" ] || continue
  [ -f reports/rd_eval_keep${k}_maeinit_holdout.json ] || \
    retry_train 3 1800 /tmp/rd_eval_maeinit.log \
      reports/rd_eval_keep${k}_maeinit_holdout.json \
      python examples/rd_eval.py --ckpt "$npz" --set holdout \
        --report reports/rd_eval_keep${k}_maeinit_holdout.json
done
echo "PHASE3 COMPLETE $(date)"
