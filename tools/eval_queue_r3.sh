#!/bin/bash
# Round-3 post-training evaluation chain (VERDICT items 3-5 evidence).
# Runs after tools/train_queue_r3.sh completes; one TPU process at a time.
# Usage: bash tools/eval_queue_r3.sh [stage...]  (default: all stages)
set -u
cd "$(dirname "$0")/.."
STAGES=${@:-vbr ladder msssim anchors bdrate}

log() { echo "=== $(date +%H:%M:%S) $*" >> /tmp/eval_r3.log; }

# newest checkpoint_<step> dir in an experiment (falls back to best_loss)
last_ckpt() {
  local d="ckpts/$1"
  local c
  c=$(ls "$d" 2>/dev/null | grep -E '^checkpoint_[0-9]+$' | sort -t_ -k2 -n | tail -1)
  echo "$d/${c:-checkpoint_best_loss}"
}

for stage in $STAGES; do
case $stage in
vbr)
  # One trained model, 6 gain levels + 2 inputscale interpolation points,
  # all through real bitstreams with a monotonicity check.
  log rd_vbr "$(last_ckpt s_vbr)"
  timeout 7200 python tools/rd_vbr.py --ckpt "$(last_ckpt s_vbr)" \
    --out results/rd_vbr.json > /tmp/eval_vbr.log 2>&1
  echo EXIT=$? >> /tmp/eval_vbr.log
  ;;
ladder)
  # Re-evaluate the deepened 5-lambda MLICPP_S ladder (same held-out set
  # as r2: 8 x dead_leaves 320^2 seed 7919) so the curves are comparable.
  log rd_curve ladder
  timeout 10800 python tools/rd_curve.py --model MLICPP_S \
    --ckpts "$(last_ckpt rd_l0035)" "$(last_ckpt rd_l0067b)" \
            "$(last_ckpt rd_l013b)" "$(last_ckpt rd_l025b)" \
            "$(last_ckpt rd_l0483b)" \
    --lambdas 0.0035 0.0067 0.013 0.025 0.0483 \
    --out results/rd_mlicpp_s_dead_leaves.json > /tmp/eval_ladder.log 2>&1
  echo EXIT=$? >> /tmp/eval_ladder.log
  ;;
msssim)
  # The MS-SSIM-optimized point (reference ladder top, lambda=60.5).
  log rd_curve msssim "$(last_ckpt msssim_605)"
  timeout 3600 python tools/rd_curve.py --model MLICPP_S \
    --ckpts "$(last_ckpt msssim_605)" --lambdas 60.5 \
    --out results/rd_msssim_605.json > /tmp/eval_msssim.log 2>&1
  echo EXIT=$? >> /tmp/eval_msssim.log
  ;;
anchors)
  # Classical anchors on the SAME held-out set (CPU/PIL only).
  log anchors
  timeout 1800 python tools/jpeg_anchor.py --codec jpeg \
    --out results/rd_jpeg_dead_leaves.json > /tmp/eval_anchor_jpeg.log 2>&1
  echo EXIT=$? >> /tmp/eval_anchor_jpeg.log
  timeout 1800 python tools/jpeg_anchor.py --codec webp \
    --out results/rd_webp_dead_leaves.json > /tmp/eval_anchor_webp.log 2>&1
  echo EXIT=$? >> /tmp/eval_anchor_webp.log
  ;;
bdrate)
  log bdrate
  for anchor in jpeg webp; do
    timeout 600 python tools/bdrate.py \
      --anchor results/rd_${anchor}_dead_leaves.json \
      --test results/rd_mlicpp_s_dead_leaves.json \
      > /tmp/eval_bdrate_${anchor}.log 2>&1
    echo EXIT=$? >> /tmp/eval_bdrate_${anchor}.log
  done
  ;;
esac
done
log eval queue done
