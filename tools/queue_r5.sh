#!/bin/bash
# Round-5 training + eval queue (VERDICT r4 items 3-5): flagship MLICPP_L
# bench checkpoint + 3-point RD ladder, VBR re-train with --train-gain and
# MGDA-UB gradnorm, MS-SSIM mini-ladder.  ONE deadline-guarded script
# (CLAUDE.md: sequenced TPU work never via separate watchers) so the TPU is
# free before the driver's end-of-round bench.
#
# Usage: bash tools/queue_r5.sh <tpu_deadline_epoch>
#
# Stage budgets are fractions of the time remaining at stage start, each
# under `timeout`, checkpoints every 1000 steps so kills are cheap; every
# training uses --resume so a re-run continues instead of restarting.
set -u
cd "$(dirname "$0")/.."
TPU_DEADLINE=${1:?}

LOG=/tmp/queue_r5.log
log() { echo "=== $(date +%H:%M:%S) $*" >> "$LOG"; }
tleft() { echo $(( TPU_DEADLINE - $(date +%s) )); }

last_ckpt() {
  local d="ckpts/$1" c
  c=$(ls "$d" 2>/dev/null | grep -E '^checkpoint_[0-9]+$' | sort -t_ -k2 -n | tail -1)
  echo "$d/${c:-checkpoint_best_loss}"
}

run() {  # run <budget_s> <logfile> cmd...
  local budget=$1 lf=$2; shift 2
  log "RUN (${budget}s): $*"
  timeout -k 60 "$budget" "$@" > "$lf" 2>&1
  log "exit $? ($lf)"
}

TRAIN="python tools/train.py --synthetic --synthetic-kind dead_leaves \
  --batch-size 8 --patch-size 256 --ckpt-every 1000 --log-freq 100 --resume"

# ---------------------------------------------------------------- Stage A
# Flagship L anchor, lambda=0.0483 (the reference ladder top this repo
# already has a single point for).  From scratch: r3's 23k-step L ckpt was
# untracked and wiped between rounds.  Budget: 40% of remaining.
T=$(tleft); A=$(( T * 40 / 100 ))
if [ "$T" -gt 1200 ]; then
  run "$A" /tmp/q_l0483.log $TRAIN --model MLICPP_L --lambda 0.0483 \
      --steps "${L_ANCHOR_STEPS:-22000}" --exp-name r5_l0483
fi

# Publish the L bench checkpoint (bf16 storage: f32 is 334 MB) as soon as
# the anchor exists, so a bench row is possible even if later stages starve.
if ls ckpts/r5_l0483/checkpoint_* >/dev/null 2>&1; then
  run 600 /tmp/q_lckpt.log python tools/make_bench_ckpt.py \
      "$(last_ckpt r5_l0483)" ckpts/bench_default_MLICPP_L --bf16
fi

# ---------------------------------------------------------------- Stage B
# L ladder branches: warm-start the two lower rates from the anchor
# (down-ladder branches on top of the full trunk — the r2 monotonicity
# failure mode was the OPPOSITE direction, an undertrained high-rate end).
T=$(tleft); B=$(( T * 22 / 100 ))
if [ "$T" -gt 1800 ] && ls ckpts/r5_l0483/checkpoint_* >/dev/null 2>&1; then
  run "$B" /tmp/q_l025.log $TRAIN --model MLICPP_L --lambda 0.025 \
      --steps "${L_BRANCH_STEPS:-8000}" --exp-name r5_l025 \
      --pretrained "$(last_ckpt r5_l0483)"
fi
T=$(tleft); B=$(( T * 28 / 100 ))
if [ "$T" -gt 1800 ] && ls ckpts/r5_l0483/checkpoint_* >/dev/null 2>&1; then
  run "$B" /tmp/q_l013.log $TRAIN --model MLICPP_L --lambda 0.013 \
      --steps "${L_BRANCH_STEPS:-8000}" --exp-name r5_l013 \
      --pretrained "$(last_ckpt r5_l0483)"
fi

# L RD curve through real bitstreams (whatever rungs exist).
T=$(tleft)
if [ "$T" -gt 900 ]; then
  CKPTS=""; LAMBDAS=""
  for pair in "r5_l013 0.013" "r5_l025 0.025" "r5_l0483 0.0483"; do
    set -- $pair
    if ls "ckpts/$1"/checkpoint_* >/dev/null 2>&1; then
      CKPTS="$CKPTS $(last_ckpt "$1")"; LAMBDAS="$LAMBDAS $2"
    fi
  done
  if [ -n "$CKPTS" ]; then
    run $(( T > 3600 ? 3600 : T )) /tmp/q_leval.log python tools/rd_curve.py \
        --model MLICPP_L --ckpts $CKPTS --lambdas $LAMBDAS \
        --out results/rd_mlicpp_l_dead_leaves.json
  fi
fi

# ---------------------------------------------------------------- Stage C
# VBR with trainable Gain + MGDA-UB gradnorm (VERDICT item 4), warm from
# the S bench checkpoint.
T=$(tleft); C=$(( T * 45 / 100 ))
if [ "$T" -gt 1500 ]; then
  run "$C" /tmp/q_vbr.log $TRAIN --model MLICPP_S_VBR --vbr --train-gain \
      --vbr-gradnorm loss --lambda 0.013 \
      --steps "${VBR_STEPS:-14000}" --exp-name r5_svbr \
      --pretrained ckpts/bench_default
fi
T=$(tleft)
if [ "$T" -gt 900 ] && ls ckpts/r5_svbr/checkpoint_* >/dev/null 2>&1; then
  run $(( T > 3000 ? 3000 : T )) /tmp/q_vbreval.log python tools/rd_vbr.py \
      --ckpt "$(last_ckpt r5_svbr)" --out results/rd_vbr.json
fi

# ---------------------------------------------------------------- Stage D
# MS-SSIM mini-ladder: two more reference lambdas below the r3 60.5 point,
# warm from the bench checkpoint (8k steps each — VERDICT item 5).
for pair in "31.73 r5_ms3173" "8.73 r5_ms873"; do
  set -- $pair
  T=$(tleft); D=$(( T * 35 / 100 ))
  if [ "$T" -gt 1500 ]; then
    run "$D" "/tmp/q_${2}.log" $TRAIN --model MLICPP_S --metrics ms-ssim \
        --lambda "$1" --steps "${MS_STEPS:-8000}" --exp-name "$2" \
        --pretrained ckpts/bench_default
  fi
done
T=$(tleft)
if [ "$T" -gt 600 ]; then
  CKPTS=""; LAMBDAS=""
  for pair in "r5_ms873 8.73" "r5_ms3173 31.73"; do
    set -- $pair
    if ls "ckpts/$1"/checkpoint_* >/dev/null 2>&1; then
      CKPTS="$CKPTS $(last_ckpt "$1")"; LAMBDAS="$LAMBDAS $2"
    fi
  done
  if [ -n "$CKPTS" ]; then
    run $(( T > 1800 ? 1800 : T )) /tmp/q_mseval.log python tools/rd_curve.py \
        --model MLICPP_S --ckpts $CKPTS --lambdas $LAMBDAS \
        --out results/rd_msssim_ladder.json
  fi
fi

# ---------------------------------------------------------------- Stage E
# Driver-shaped bench row for L (BENCH_OUT evidence committed afterwards).
T=$(tleft)
if [ "$T" -gt 900 ] && [ -d ckpts/bench_default_MLICPP_L ]; then
  run $(( T > 2400 ? 2400 : T )) /tmp/q_lbench.log \
      env BENCH_MODEL=MLICPP_L BENCH_BATCH=32 BENCH_VERBOSE=1 \
      BENCH_PIPELINE_BUDGET=60 \
      BENCH_OUT=results/bench_r5_staged_l.jsonl python bench.py
fi

log "queue done ($(tleft)s to deadline)"
