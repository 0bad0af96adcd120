#!/bin/bash
# Round-3 sequential TPU training queue (VERDICT items 2-5).
# One job at a time (the chip admits one process); every job checkpoints
# frequently and resumes, so the queue can be killed for bench windows and
# rerun — completed jobs fast-forward via --resume.
# Usage: bash tools/train_queue_r3.sh [stage...]   (default: all stages)
set -u
cd "$(dirname "$0")/.."
STAGES=${@:-l vbr ladder msssim}

run() { echo "=== $(date +%H:%M:%S) $*" >> /tmp/queue_r3.log; "$@"; }

for stage in $STAGES; do
case $stage in
l)
  # Flagship MLICPP_L: warm-continue the r2 3k-step run to 23k steps.
  run python tools/train.py --model MLICPP_L --synthetic \
    --synthetic-kind dead_leaves --lambda 0.0483 --steps 23000 \
    --batch-size 8 --patch-size 256 --exp-name l_flagship --resume \
    --ckpt-every 4000 --log-freq 200 >> /tmp/q_l.log 2>&1
  ;;
vbr)
  # MLICPP_S_VBR: MGDA multi-rate training, warm-started from the trained
  # fixed-rate S checkpoint (shape-filtered load covers shared modules).
  run python tools/train.py --model MLICPP_S_VBR --vbr --synthetic \
    --synthetic-kind dead_leaves --steps 6000 --batch-size 8 \
    --patch-size 256 --exp-name s_vbr --resume \
    --pretrained ckpts/bench_default \
    --ckpt-every 500 --log-freq 50 >> /tmp/q_vbr.log 2>&1
  ;;
ladder)
  # Deepen the 5-lambda MLICPP_S ladder: resume each exp to +17k steps.
  for pair in "0.0035 rd_l0035 11500" "0.0067 rd_l0067b 11000" \
              "0.013 rd_l013b 11000" "0.025 rd_l025b 11000" \
              "0.0483 rd_l0483b 12500"; do
    set -- $pair
    run python tools/train.py --model MLICPP_S --synthetic \
      --synthetic-kind dead_leaves --lambda $1 --steps $3 \
      --batch-size 8 --patch-size 256 --exp-name $2 --resume \
      --ckpt-every 1000 --log-freq 100 >> /tmp/q_ladder_$1.log 2>&1
  done
  ;;
msssim)
  # One MS-SSIM-optimized point (reference ladder top, lambda=60.5).
  run python tools/train.py --model MLICPP_S --synthetic \
    --synthetic-kind dead_leaves --metrics ms-ssim --lambda 60.5 \
    --steps 4000 --batch-size 8 --patch-size 256 --exp-name msssim_605 \
    --resume --pretrained ckpts/bench_default \
    --ckpt-every 1000 --log-freq 100 >> /tmp/q_msssim.log 2>&1
  ;;
esac
done
echo "=== $(date +%H:%M:%S) queue done" >> /tmp/queue_r3.log
