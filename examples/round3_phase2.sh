#!/bin/bash
# Round-3 phase 2: post-chain chip work, run unattended after
# examples/round3_chain.sh (the mask-ratio sweep + second rate point) exits.
#
#   1. dual-accounting eval (examples/rd_eval.py) of each sweep checkpoint on
#      BOTH the holdout and its own train images -> quantifies the
#      memorization/generalization gap and reports bpp under the published
#      curve's original-resolution accounting next to the 224^2 harness one.
#   2. decode-path latency bench (examples/decode_bench.py).
#   3. the reference's MAE-init workflow at full scale: MAE-base pretrain on
#      the non-holdout Kodak crops, then a keep-49 sweep seeded from it
#      (reports/rd_keep49_maeinit.json vs the from-scratch reports/rd_keep49.json).
#   4. full bench.py (2-point rd_curve from committed checkpoints, full-dims
#      stage fields).
#
# Stages retry in fresh processes under `timeout`; training auto-resumes from
# its newest checkpoint (same wedged-tunnel contract as round3_chain.sh).
set -u
cd "$(dirname "$0")/.."
mkdir -p reports

CHAIN_PID=${CHAIN_PID:-}
if [ -n "$CHAIN_PID" ]; then
  echo "waiting for chain pid $CHAIN_PID"
  while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
  echo "chain done $(date)"
fi

retry() {  # retry <n> <timeout_s> <log> <cmd...>
  local n=$1 t=$2 log=$3; shift 3
  for attempt in $(seq 1 "$n"); do
    echo "=== attempt $attempt: $* $(date)" | tee -a "$log"
    timeout "$t" "$@" >> "$log" 2>&1 && return 0
    echo "rc=$?" >> "$log"
    sleep 20
  done
  echo "FAILED after $n attempts: $*" | tee -a "$log"
  return 1
}

# 1. dual-accounting evals
for k in 49 100 144; do
  npz=/tmp/rd_keep${k}.f16.npz
  [ -f "$npz" ] || continue
  [ -f reports/rd_eval_keep${k}_holdout.json ] || retry 3 1800 /tmp/rd_eval.log \
    python examples/rd_eval.py --ckpt "$npz" --set holdout \
      --report reports/rd_eval_keep${k}_holdout.json
  [ -f reports/rd_eval_keep${k}_train.json ] || retry 3 3600 /tmp/rd_eval.log \
    python examples/rd_eval.py --ckpt "$npz" --set train \
      --report reports/rd_eval_keep${k}_train.json
done

# 2. decode bench
[ -f /tmp/decode_bench_done ] || { retry 3 2400 /tmp/decode_bench.log \
  python examples/decode_bench.py && touch /tmp/decode_bench_done; }

# 3. MAE-init workflow at full scale
MAE_STEPS=${MAE_STEPS:-60000}
if [ ! -f /tmp/mae_kodak.f16.npz ]; then
  for attempt in 1 2 3 4 5 6; do
    [ -f /tmp/mae_kodak.f16.npz ] && break
    echo "=== mae pretrain attempt $attempt $(date)" | tee -a /tmp/mae_pretrain.log
    timeout 5400 python examples/mae_pretrain_kodak.py --steps "$MAE_STEPS" \
      --flip --ckpt-dir /tmp/mae_ckpt --save /tmp/mae_kodak.f16.npz \
      >> /tmp/mae_pretrain.log 2>&1
    echo "rc=$?" >> /tmp/mae_pretrain.log
    sleep 20
  done
fi
if [ -f /tmp/mae_kodak.f16.npz ] && [ ! -f reports/rd_keep49_maeinit.json ]; then
  for attempt in 1 2 3 4 5 6; do
    [ -f reports/rd_keep49_maeinit.json ] && break
    echo "=== maeinit sweep attempt $attempt $(date)" | tee -a /tmp/rd_maeinit.log
    timeout 5400 python examples/rd_sweep.py --keep 49 --lmbda 1.0 \
      --steps 40000 --flip --mae-init /tmp/mae_kodak.f16.npz \
      --ckpt-dir /tmp/rd_ckpt_maeinit --report reports/rd_keep49_maeinit.json \
      --save /tmp/rd_keep49_maeinit.f16.npz >> /tmp/rd_maeinit.log 2>&1
    echo "rc=$?" >> /tmp/rd_maeinit.log
    sleep 20
  done
fi

# 4. full bench
retry 2 3600 /tmp/bench_phase2.log python bench.py
echo "PHASE2 COMPLETE $(date)"
