#!/bin/bash
# Round-5 TPU queue, part 3 (replaces the tail of scripts/r5c_batch.sh).
# Today's tunnel runs ~10x faster than the round-4 rate the nuScenes
# stage was sized with, so the rung is promoted to the full 12k-step fast
# recipe — a direct comparison against Soak D's 12k constant-LR 0.5036.
# Waits for the orphaned stage-C process (PID $1) to release the chip.
set -u
cd /root/repo
RUNS=/root/runs/r5
STATUS=$RUNS/status.log
log() { echo "$(date +%F' '%H:%M:%S) $*" >> "$STATUS"; }
CPID=${1:?pid of stage-C timeout process}

DEADLINE=${DEADLINE:-$(date -d 'today 13:30' +%s)}
remaining() { echo $(( DEADLINE - $(date +%s) )); }
guard() {
    if [ "$(remaining)" -lt "$1" ]; then log "SKIP $2 (needs $1s, $(remaining)s left)"; return 1; fi
    return 0
}

COMMON="--bsz 8 --nworkers 4 --val_step 500 --viz_step 0 \
  --resize_lim 0.70 0.85 --compute_dtype bfloat16 --async_save \
  --max_steps 4000 --lr_schedule cosine --warmup_steps 500 --decay_steps 4000"

log "r5d: waiting for stage C (pid $CPID)"
while kill -0 "$CPID" 2>/dev/null; do sleep 15; done
log "r5d: stage C done"

if guard 3000 D; then
log "D: cosine 4k seed 2 (VERDICT 3)"
timeout -k 60 5400 python train_simbev.py --dataroot /tmp/fix48 $COMMON \
    --seed 2 --watchdog_secs 300 --supervise 3 \
    --logdir "$RUNS/cosine4k_s2" > "$RUNS/cosine4k_s2.out" 2>&1
log "D rc=$?"
fi

if guard 3000 E; then
log "E: resnet18+cosine 4k composition (VERDICT 2)"
timeout -k 60 5400 python train_simbev.py --dataroot /tmp/fix48 $COMMON \
    --variant resnet18 --watchdog_secs 300 --supervise 3 \
    --logdir "$RUNS/resnet18_cosine4k" > "$RUNS/resnet18_cosine4k.out" 2>&1
log "E rc=$?"
fi

if guard 2400 H; then
log "H: stretch 4k rerun with per-class pos_weight (VERDICT 1 follow-up)"
timeout -k 60 5400 python train_simbev.py --dataroot /tmp/fix_stretch \
    --bsz 4 --nworkers 4 --val_step 500 --viz_step 0 \
    --xbound -50.0 50.0 0.25 --ybound -50.0 50.0 0.25 \
    --label_mode multiclass --label_classes 0 1 2 3 --variant b4 \
    --pos_weight 2.13 25 25 25 \
    --resize_lim 0.70 0.85 --compute_dtype bfloat16 --async_save \
    --max_steps 4000 --lr_schedule cosine --warmup_steps 500 --decay_steps 4000 \
    --watchdog_secs 300 --supervise 3 \
    --logdir "$RUNS/stretch4k_pw" > "$RUNS/stretch4k_pw.out" 2>&1
log "H rc=$?"
fi

# F: nuScenes 96-scene rung at the FULL 12k with the fast recipe
# (cosine 12k + EMA + bf16) — reserve an hour for the G/I tail.
REM=$(remaining)
if [ "$REM" -ge 5400 ]; then
log "F: nuScenes 96-scene fast recipe, 12000 steps (VERDICT 4)"
timeout -k 60 $(( REM - 3600 )) python scripts/train_nuscenes.py \
    --dataroot /tmp/nusc_fix96 --bsz 8 --nworkers 4 \
    --max_steps 12000 --compute_dtype bfloat16 \
    --lr_schedule cosine --warmup_steps 500 --decay_steps 12000 \
    --ema_decay 0.999 --watchdog_secs 300 --supervise 3 \
    --logdir "$RUNS/nusc96_fast" > "$RUNS/nusc96_fast.out" 2>&1
log "F rc=$?"
else
log "SKIP F (only ${REM}s left)"
fi

if guard 2400 G; then
log "G: scoped-VMEM probe at cliff shapes (VERDICT 5)"
timeout -k 60 2400 python scripts/xla_flag_sweep.py --dtype float32 \
    --bsz 16 --mode step --iters 10 --vmem_kib 16384 32768 \
    > "$RUNS/vmem_cliff_f32b16.out" 2>&1
log "G1 rc=$?"
timeout -k 60 1800 python scripts/xla_flag_sweep.py --dtype bfloat16 \
    --bsz 32 --mode infer --iters 10 --vmem_kib 16384 32768 \
    > "$RUNS/vmem_cliff_bf16b32.out" 2>&1
log "G2 rc=$?"
fi

if guard 900 I; then
CKPT="$RUNS/stretch4k_pw/ckpts"
[ -d "$CKPT/best" ] || CKPT="$RUNS/stretch4k/ckpts"
log "I: stretch eval_model_iou cross-check ($CKPT, VERDICT 1 done-criterion)"
timeout -k 60 1800 python -m lss_carla_tpu.explore eval_model_iou \
    --dataroot /tmp/fix_stretch --checkpoint "$CKPT" --best \
    --variant b4 --xbound -50 50 0.25 --ybound -50 50 0.25 \
    --label_mode multiclass --label_classes 0 1 2 3 --bsz 4 \
    > "$RUNS/stretch_eval.out" 2>&1
log "I rc=$?"
fi

if guard 1800 J; then
log "J: cosine 4k seed 3 (bonus error-bar point)"
timeout -k 60 3600 python train_simbev.py --dataroot /tmp/fix48 $COMMON \
    --seed 3 --watchdog_secs 300 --supervise 3 \
    --logdir "$RUNS/cosine4k_s3" > "$RUNS/cosine4k_s3.out" 2>&1
log "J rc=$?"
fi
log "ALL DONE"
