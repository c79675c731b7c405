#!/bin/bash
# Round-5 TPU queue — VERDICT r4 "Next round" items, in rank order:
#   A. stretch 400x400 multiclass accuracy soak (item 1; fixture /tmp/fix_stretch)
#   B. EMA+cosine 4k composition                 (item 2)
#   C. cosine 4k seed 1 + embedded watchdog/supervisor drill (items 3 + 6:
#      --debug_stall_at freezes the loop at step 1500; the watchdog must
#      hard-exit 42 and --supervise must restart with --resume, after which
#      the run trains through to 4000 — a valid seed point AND the drill)
#   D. cosine 4k seed 2                          (item 3)
#   E. resnet18+cosine 4k composition            (item 2)
#   G. scoped-VMEM probe at the batch-size cliff shapes (item 5)
#   F. nuScenes 96-scene rung with the fast recipe (item 4) — step count
#      sized to the remaining clock so the cosine decay completes.
#
# ONE TPU process at a time (CLAUDE.md). No pid-file polling races
# (round-4 advisor finding): stages run serially in this one script and
# gate on in-band "done" markers only.
set -u
cd /root/repo
RUNS=/root/runs/r5
mkdir -p "$RUNS"
STATUS=$RUNS/status.log
log() { echo "$(date +%F' '%H:%M:%S) $*" >> "$STATUS"; }

# Hard TPU deadline: leave the chip free for the end-of-round driver bench.
DEADLINE=${DEADLINE:-$(date -d 'today 13:30' +%s)}
remaining() { echo $(( DEADLINE - $(date +%s) )); }
# guard <needed_s> <name> -> 0 if the stage fits before the deadline
guard() {
    if [ "$(remaining)" -lt "$1" ]; then log "SKIP $2 (needs $1s, $(remaining)s left)"; return 1; fi
    return 0
}

COMMON="--bsz 8 --nworkers 4 --val_step 500 --viz_step 0 \
  --resize_lim 0.70 0.85 --compute_dtype bfloat16 --async_save \
  --max_steps 4000 --lr_schedule cosine --warmup_steps 500 --decay_steps 4000"

log "waiting for fix_stretch regen"
while ! grep -q "fix_stretch done" "$RUNS/gen_stretch.out" 2>/dev/null; do sleep 10; done
log "fix_stretch ready"

if guard 4200 A; then
log "A: stretch 400x400 multiclass 4k cosine soak (VERDICT 1)"
timeout -k 60 7200 python train_simbev.py --dataroot /tmp/fix_stretch \
    --bsz 4 --nworkers 4 --val_step 500 --viz_step 0 \
    --xbound -50.0 50.0 0.25 --ybound -50.0 50.0 0.25 \
    --label_mode multiclass --label_classes 0 1 2 3 --variant b4 \
    --resize_lim 0.70 0.85 --compute_dtype bfloat16 --async_save \
    --max_steps 4000 --lr_schedule cosine --warmup_steps 500 --decay_steps 4000 \
    --watchdog_secs 300 --supervise 3 \
    --logdir "$RUNS/stretch4k" > "$RUNS/stretch4k.out" 2>&1
log "A rc=$?"
fi

if guard 3000 B; then
log "B: EMA+cosine 4k composition (VERDICT 2)"
timeout -k 60 5400 python train_simbev.py --dataroot /tmp/fix48 $COMMON \
    --ema_decay 0.999 --watchdog_secs 300 --supervise 3 \
    --logdir "$RUNS/ema_cosine4k" > "$RUNS/ema_cosine4k.out" 2>&1
log "B rc=$?"
fi

if guard 3600 C; then
log "C: cosine 4k seed 1 + watchdog/supervisor drill (VERDICT 3+6)"
timeout -k 60 7200 python train_simbev.py --dataroot /tmp/fix48 $COMMON \
    --seed 1 --debug_stall_at 1500 --watchdog_secs 120 --supervise 2 \
    --logdir "$RUNS/cosine4k_s1" > "$RUNS/cosine4k_s1.out" 2>&1
log "C rc=$?"
fi

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

if guard 2700 G; then
log "G: scoped-VMEM probe at cliff shapes (VERDICT 5)"
timeout -k 60 2400 python scripts/xla_flag_sweep.py --dtype float32 \
    --bsz 16 --mode step --iters 10 --vmem_kib 16384 32768 \
    > "$RUNS/vmem_cliff_f32b16.out" 2>&1
log "G1 rc=$?"
timeout -k 60 2400 python scripts/xla_flag_sweep.py --dtype bfloat16 \
    --bsz 32 --mode infer --iters 10 --vmem_kib 16384 32768 \
    > "$RUNS/vmem_cliff_bf16b32.out" 2>&1
log "G2 rc=$?"
fi

# F sizes its cosine recipe to the clock that is actually left: ~1.0 s/step
# wall (r4 measured 0.87 constant-LR f32; EMA doubles validation), minus
# compile + final-val margin. A complete short cosine beats a truncated 12k.
REM=$(remaining)
STEPS=$(( (REM - 1500) / 1 ))
[ "$STEPS" -gt 12000 ] && STEPS=12000
STEPS=$(( STEPS / 500 * 500 ))
if [ "$STEPS" -ge 2000 ]; then
log "F: nuScenes 96-scene fast recipe, $STEPS steps (VERDICT 4)"
timeout -k 60 $(( REM - 300 )) python scripts/train_nuscenes.py \
    --dataroot /tmp/nusc_fix96 --bsz 8 --nworkers 4 \
    --max_steps $STEPS --compute_dtype bfloat16 \
    --lr_schedule cosine --warmup_steps 500 --decay_steps $STEPS \
    --ema_decay 0.999 --watchdog_secs 300 --supervise 3 \
    --logdir "$RUNS/nusc96_fast" > "$RUNS/nusc96_fast.out" 2>&1
log "F rc=$? (steps=$STEPS)"
else
log "SKIP F (only ${REM}s left)"
fi
log "ALL DONE"
