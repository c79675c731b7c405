#!/bin/bash
# Round-4 TPU queue (VERDICT r3 items 1, 5, 3, 6). ONE TPU process at a time.
#   A. mbconv_bench at the real trunk batch (bsz*ncams=48): isolated
#      Pallas fused dwconv+BN-stats vs XLA, per hot stage  (item 1)
#   B. e2e bf16 step: baseline then --fused_dw              (item 1)
#   C. XLA flag sweep on the bf16 step                      (item 5)
#   D. cosine 4k confirm (round-3 comment claims 0.7052)    (item 3)
#   E. 96-scene nuScenes soak at 12k steps                  (item 6)
# Between stages: run $RUNS/inject.sh if present (lets the builder queue
# the EMA re-run after the offline diagnosis lands, without killing this).
set -u
cd /root/repo
RUNS=/root/runs/r4
mkdir -p "$RUNS"
STATUS=$RUNS/status.log
log() { echo "$(date +%F' '%H:%M:%S) $*" >> "$STATUS"; }
inject() {
    if [ -x "$RUNS/inject.sh" ]; then
        log "inject: start"
        "$RUNS/inject.sh" >> "$RUNS/inject.out" 2>&1
        log "inject: rc=$?"
        mv "$RUNS/inject.sh" "$RUNS/inject.done.$(date +%s)"
    fi
}

log "A: mbconv_bench bsz 48 (trunk batch = bsz 8 x 6 cams)"
timeout 3600 python scripts/mbconv_bench.py --iters 50 --bsz 48 \
    > "$RUNS/mbconv_bench.json" 2> "$RUNS/mbconv_bench.err"
RC_A=$?
log "A rc=$RC_A"
inject

log "B: e2e bf16 step, baseline then --fused_dw"
timeout 3600 python bench.py --mode step --dtype bfloat16 --iters 20 \
    > "$RUNS/step_baseline.json" 2> "$RUNS/step_baseline.err"
log "B baseline rc=$?"
if [ "$RC_A" -eq 0 ]; then
    timeout 3600 python bench.py --mode step --dtype bfloat16 --iters 20 \
        --fused_dw > "$RUNS/step_fused.json" 2> "$RUNS/step_fused.err"
    log "B fused rc=$?"
else
    log "B fused SKIPPED (stage A failed — kernel broken on hardware)"
fi
inject

log "C: XLA flag sweep (bf16 step)"
timeout 10800 python scripts/xla_flag_sweep.py --dtype bfloat16 --iters 20 \
    > "$RUNS/xla_flag_sweep.out" 2> "$RUNS/xla_flag_sweep.err"
log "C rc=$?"
inject

log "D: cosine 4k confirm (ablation table, ACCURACY.md)"
timeout 7200 python train_simbev.py --dataroot /tmp/fix48 --bsz 8 \
    --nworkers 3 --val_step 500 --viz_step 0 --resize_lim 0.70 0.85 \
    --compute_dtype bfloat16 --watchdog_secs 300 \
    --logdir "$RUNS/abl_cosine4k" --max_steps 4000 \
    --lr_schedule cosine --warmup_steps 500 --decay_steps 4000 \
    > "$RUNS/abl_cosine4k.out" 2>&1
log "D rc=$?"
inject

log "E: 96-scene nuScenes soak, 12k steps (upstream recipe)"
# supervisor loop: the axon tunnel has hung mid-soak twice; the watchdog
# hard-exits 42 and we restart with --resume (best ckpt survives either way)
ATT=0
RESUME=""
while [ "$ATT" -lt 3 ]; do
    ATT=$((ATT + 1))
    timeout 21600 python scripts/train_nuscenes.py --dataroot /tmp/nusc_fix96 \
        --bsz 8 --nworkers 3 --max_steps 12000 --watchdog_secs 300 \
        --logdir "$RUNS/nusc96_12k" $RESUME \
        >> "$RUNS/nusc96_12k.out" 2>&1
    RC_E=$?
    log "E attempt $ATT rc=$RC_E"
    [ "$RC_E" -eq 42 ] || break
    RESUME="--resume $RUNS/nusc96_12k/ckpts"
done
inject
log "ALL DONE"
