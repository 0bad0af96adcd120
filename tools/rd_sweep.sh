#!/bin/bash
# RD-evidence sweep (VERDICT round-1 item #2): train MLICPP_S at 5 lambda
# values on the dead-leaves stream (highest rate from scratch, lower rates
# warm-started from the previous level — standard rate-ladder fine-tuning),
# then build the RD curve through the real codec and BD-rate it.
# Run from /root/repo; logs to /tmp/rd_sweep/.
set -e
cd "$(dirname "$0")/.."
LOG=/tmp/rd_sweep
mkdir -p $LOG results

COMMON="--model MLICPP_S --synthetic --synthetic-kind dead_leaves \
  --batch-size 8 --patch-size 256 --ckpt-dir ./ckpts --ckpt-every 2000 \
  --val-every 5000 --val-images 2 --log-freq 100 --warmup-steps 100"

S0=${S0:-20000}   # steps for the from-scratch high-rate run
SF=${SF:-8000}    # steps per warm-started fine-tune

echo "=== lambda 0.0483 (scratch, $S0 steps)"
python tools/train.py $COMMON --exp-name rd_l0483 --lambda 0.0483 \
  --steps $S0 --lr-milestones $((S0*8/10)) --resume \
  >> $LOG/l0483.log 2>&1
prev=./ckpts/rd_l0483/checkpoint_$S0

for lam in 0.025 0.013 0.0067 0.0035; do
  tag=rd_l${lam#0.}
  echo "=== lambda $lam (warm-start from $prev, $SF steps)"
  python tools/train.py $COMMON --exp-name $tag --lambda $lam \
    --steps $SF --lr-milestones $((SF*3/4)) --pretrained $prev --resume \
    >> $LOG/$tag.log 2>&1
  prev=./ckpts/$tag/checkpoint_$SF
done

echo "=== RD curve through the real codec"
python tools/rd_curve.py --model MLICPP_S \
  --ckpts ./ckpts/rd_l0483/checkpoint_$S0 ./ckpts/rd_l025/checkpoint_$SF \
          ./ckpts/rd_l013/checkpoint_$SF ./ckpts/rd_l0067/checkpoint_$SF \
          ./ckpts/rd_l0035/checkpoint_$SF \
  --lambdas 0.0483 0.025 0.013 0.0067 0.0035 \
  --out results/rd_mlicpp_s_dead_leaves.json >> $LOG/rd_curve.log 2>&1

python tools/bdrate.py --test results/rd_mlicpp_s_dead_leaves.json \
  --anchor /root/reference/results/kodak/mlicplusplus_mse.json \
  | tee $LOG/bdrate.log || true
echo "=== sweep done"
