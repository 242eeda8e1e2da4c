#!/bin/bash
# Round-3 on-chip training chain (VERDICT r2 #2 and #5), run unattended:
#
#   1-3. mask-ratio R-D sweep: one MCM per --keep in {49,100,144} at a single
#        shared lambda, reference token ordering + bpp accounting, held-out
#        kodim20/kodim23 eval through the real rANS codec (examples/rd_sweep.py).
#        Reports land in reports/rd_keep{K}.json (committed); f16 npz
#        checkpoints land in /tmp (too large to commit three of).
#   4.   second committed rate point: lambda=1e-2, 100k steps under the
#        Quicktest.ipynb Kodak-24 protocol (examples/train_demo.py), exported
#        as checkpoints/mcm_kodak_l0.01_100k.f16.npz so bench/test_model can
#        show a 2-point R-D curve from in-repo artifacts.
#
# Every stage retries in a fresh process under `timeout` and auto-resumes
# from its newest checkpoint (wedged-tunnel recovery: at most one eval
# interval is lost per kill).
set -u
cd "$(dirname "$0")/.."
mkdir -p reports

SWEEP_LMBDA=${SWEEP_LMBDA:-1.0}
SWEEP_STEPS=${SWEEP_STEPS:-40000}

run_sweep() {
  local keep=$1
  local report=reports/rd_keep${keep}.json
  local log=/tmp/rd_keep${keep}.log
  for attempt in 1 2 3 4 5 6 7 8; do
    [ -f "$report" ] && { echo "sweep keep=$keep done"; return 0; }
    echo "=== sweep keep=$keep attempt $attempt $(date)" | tee -a "$log"
    timeout 5400 python examples/rd_sweep.py --keep "$keep" \
      --lmbda "$SWEEP_LMBDA" --steps "$SWEEP_STEPS" \
      --ckpt-dir /tmp/rd_ckpt_keep${keep} --report "$report" \
      --save /tmp/rd_keep${keep}.f16.npz >> "$log" 2>&1
    echo "rc=$?" >> "$log"
    sleep 20
  done
  echo "sweep keep=$keep FAILED after retries" | tee -a "$log"
  return 1
}

run_rate2() {
  local total=${RATE2_STEPS:-100000}
  local log=/tmp/rate2.log
  local npz=checkpoints/mcm_kodak_l0.01_100k.f16.npz
  for attempt in 1 2 3 4 5 6 7 8; do
    [ -f "$npz" ] && { echo "rate2 done"; return 0; }
    local newest resume remaining
    # exclude Orbax .orbax-checkpoint-tmp staging dirs a mid-save kill
    # leaves behind (same rule as train/checkpoint.py latest_step_checkpoint)
    newest=$(ls -d /tmp/rate2_ckpt/demo_step* 2>/dev/null \
             | grep -v 'checkpoint-tmp' \
             | sed 's/.*demo_step//' | grep -E '^[0-9]+$' | sort -n | tail -1)
    if [ -n "${newest:-}" ]; then
      resume="--resume /tmp/rate2_ckpt/demo_step${newest}"
      remaining=$((total - newest))
    else
      resume=""
      remaining=$total
    fi
    [ "$remaining" -le 0 ] && remaining=1  # just re-run the final eval+export
    echo "=== rate2 attempt $attempt resume='${newest:-none}' remaining=$remaining $(date)" | tee -a "$log"
    timeout 7200 python examples/train_demo.py --lmbda 1e-2 \
      --steps "$remaining" --eval-every 25000 --eval-n 8 \
      --save /tmp/rate2_ckpt $resume --save-npz "$npz" >> "$log" 2>&1
    echo "rc=$?" >> "$log"
    sleep 20
  done
  echo "rate2 FAILED after retries" | tee -a "$log"
  return 1
}

run_sweep 49
run_sweep 100
run_sweep 144
run_rate2
echo "CHAIN COMPLETE $(date)"
