#!/bin/bash
# End-of-round-3 re-prioritized queue: evidence first, deepening as time
# allows.  Replaces the tail of train_queue_r3.sh + eval_queue_r3.sh when
# wall-clock is short: the VBR sweep and the MS-SSIM point are new
# capabilities (VERDICT items 3/5); deepening the two top ladder rungs is a
# refinement (item 4) and is cut first.  Every stage is deadline-guarded so
# the TPU is free before the driver's end-of-round bench.
#
# Usage: bash tools/queue_r3c.sh <wait_pid> <tpu_deadline_epoch> <train_cutoff_epoch>
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:?}
TPU_DEADLINE=${2:?}   # all TPU work must be done by this epoch
TRAIN_CUTOFF=${3:?}   # no new training stage starts after this epoch

log() { echo "=== $(date +%H:%M:%S) $*" >> /tmp/queue_r3c.log; }
tleft() { echo $(( $1 - $(date +%s) )); }

# newest checkpoint_<step> dir in an experiment (falls back to best_loss)
last_ckpt() {
  local d="ckpts/$1" c
  c=$(ls "$d" 2>/dev/null | grep -E '^checkpoint_[0-9]+$' | sort -t_ -k2 -n | tail -1)
  echo "$d/${c:-checkpoint_best_loss}"
}

log "waiting for pid $WAIT_PID"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
log "pid $WAIT_PID done"

# 1. VBR sweep — first real evaluation of the trained MGDA model.
T=$(tleft "$TPU_DEADLINE"); if [ "$T" -gt 600 ]; then
  log "vbr eval (budget ${T}s)"
  timeout $(( T > 4500 ? 4500 : T )) python tools/rd_vbr.py \
    --ckpt "$(last_ckpt s_vbr)" --out results/rd_vbr.json \
    > /tmp/ev_vbr.log 2>&1
  echo EXIT=$? >> /tmp/ev_vbr.log; log "vbr eval exit"
fi

# 2. MS-SSIM-optimized point: train 4000 steps from the bench ckpt, eval.
if [ "$(date +%s)" -lt "$TRAIN_CUTOFF" ]; then
  T=$(tleft "$TRAIN_CUTOFF"); log "msssim train (budget ${T}s)"
  timeout $(( T > 3600 ? 3600 : T )) python tools/train.py --model MLICPP_S \
    --synthetic --synthetic-kind dead_leaves --metrics ms-ssim --lambda 60.5 \
    --steps 4000 --batch-size 8 --patch-size 256 --exp-name msssim_605 \
    --resume --pretrained ckpts/bench_default --ckpt-every 1000 \
    --log-freq 100 > /tmp/q_msssim.log 2>&1
  log "msssim train exit $?"
fi
T=$(tleft "$TPU_DEADLINE")
if [ "$T" -gt 600 ] && ls ckpts/msssim_605 >/dev/null 2>&1; then
  log "msssim eval"
  timeout $(( T > 1800 ? 1800 : T )) python tools/rd_curve.py --model MLICPP_S \
    --ckpts "$(last_ckpt msssim_605)" --lambdas 60.5 \
    --out results/rd_msssim_605.json > /tmp/ev_msssim.log 2>&1
  echo EXIT=$? >> /tmp/ev_msssim.log; log "msssim eval exit"
fi

# 3. Deepen the two top ladder rungs only if time allows (+4k steps each).
for pair in "0.025 rd_l025b 6500" "0.0483 rd_l0483b 8000"; do
  set -- $pair
  T=$(tleft "$TRAIN_CUTOFF")
  if [ "$T" -gt 900 ]; then
    log "ladder deepen $1 -> $3 (budget ${T}s)"
    timeout $(( T > 2400 ? 2400 : T )) python tools/train.py --model MLICPP_S \
      --synthetic --synthetic-kind dead_leaves --lambda "$1" --steps "$3" \
      --batch-size 8 --patch-size 256 --exp-name "$2" --resume \
      --ckpt-every 1000 --log-freq 100 >> "/tmp/q_ladder_$1.log" 2>&1
    log "ladder $1 exit $?"
  else
    log "ladder $1 skipped (past cutoff)"
  fi
done

# 4. Re-evaluate the full 5-lambda ladder through real bitstreams.
T=$(tleft "$TPU_DEADLINE"); if [ "$T" -gt 900 ]; then
  log "ladder eval (budget ${T}s)"
  timeout "$T" python tools/rd_curve.py --model MLICPP_S \
    --ckpts "$(last_ckpt rd_l0035)" "$(last_ckpt rd_l0067b)" \
            "$(last_ckpt rd_l013b)" "$(last_ckpt rd_l025b)" \
            "$(last_ckpt rd_l0483b)" \
    --lambdas 0.0035 0.0067 0.013 0.025 0.0483 \
    --out results/rd_mlicpp_s_dead_leaves.json > /tmp/ev_ladder.log 2>&1
  echo EXIT=$? >> /tmp/ev_ladder.log; log "ladder eval exit"
fi

# 5. Classical anchors + BD-rate (CPU/PIL only, cheap).
log anchors
timeout 1200 python tools/jpeg_anchor.py --codec jpeg \
  --out results/rd_jpeg_dead_leaves.json > /tmp/ev_jpeg.log 2>&1
timeout 1200 python tools/jpeg_anchor.py --codec webp \
  --out results/rd_webp_dead_leaves.json > /tmp/ev_webp.log 2>&1
log bdrate
{ echo "== S ladder vs JPEG =="; python tools/bdrate.py \
    --test results/rd_mlicpp_s_dead_leaves.json \
    --anchor results/rd_jpeg_dead_leaves.json; \
  echo "== S ladder vs WebP =="; python tools/bdrate.py \
    --test results/rd_mlicpp_s_dead_leaves.json \
    --anchor results/rd_webp_dead_leaves.json; } > /tmp/ev_bdrate.log 2>&1
log "ALL DONE"
