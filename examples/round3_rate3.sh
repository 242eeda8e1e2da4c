#!/bin/bash
# Round-3 continuation: third committed rate point for the R-D curve.
#
# lambda=1e-1, 100k steps under the same Quicktest.ipynb Kodak-24 protocol
# as the two committed points (checkpoints/mcm_kodak_l1_150k.f16.npz at
# lambda=1.0 and mcm_kodak_l0.01_100k.f16.npz at lambda=1e-2), exported as
# checkpoints/mcm_kodak_l0.1_100k.f16.npz. bench.py's rd_curve stage picks
# it up automatically from the npz __meta__ provenance, giving a 3-point
# committed curve: the measured distortion ladder at near-constant total
# rate (side info dominates at this operating point — see PARITY.md).
#
# Same wedged-tunnel recovery pattern as round3_chain.sh: fresh process per
# attempt under `timeout`, auto-resume from the newest Orbax step dir.
set -u
cd "$(dirname "$0")/.."

total=${RATE3_STEPS:-100000}
log=/tmp/rate3.log
npz=checkpoints/mcm_kodak_l0.1_100k.f16.npz
for attempt in 1 2 3 4 5 6 7 8; do
  [ -f "$npz" ] && { echo "rate3 done"; exit 0; }
  newest=$(ls -d /tmp/rate3_ckpt/demo_step* 2>/dev/null \
           | grep -v 'checkpoint-tmp' \
           | sed 's/.*demo_step//' | grep -E '^[0-9]+$' | sort -n | tail -1)
  if [ -n "${newest:-}" ]; then
    resume="--resume /tmp/rate3_ckpt/demo_step${newest}"
    remaining=$((total - newest))
  else
    resume=""
    remaining=$total
  fi
  [ "$remaining" -le 0 ] && remaining=1  # just re-run the final eval+export
  echo "=== rate3 attempt $attempt resume='${newest:-none}' remaining=$remaining $(date)" | tee -a "$log"
  timeout 7200 python examples/train_demo.py --lmbda 1e-1 \
    --steps "$remaining" --eval-every 25000 --eval-n 8 \
    --save /tmp/rate3_ckpt $resume --save-npz "$npz" >> "$log" 2>&1
  echo "rc=$?" >> "$log"
  sleep 20
done
echo "rate3 FAILED after retries" | tee -a "$log"
exit 1
