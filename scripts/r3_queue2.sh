#!/bin/bash
# Round-3 TPU queue, part 2 — replaces scripts/r3_measure_batch.sh's waiter.
# Waits for scripts/r3_soak_batch.sh to finish (ALL DONE marker), then:
#   0. abl_ema_v2: re-run the EMA ablation with the ema_batch_stats fix
#      (the round-3 finding: EMA params + current BN stats scored val 0.000
#      for 3.5k steps; the fix averages the BN buffers with the same decay)
#   A. mbconv_bench: isolated Pallas fused dwconv+BN-stats vs XLA
#   B. e2e bf16 train step: --fused_dw vs baseline, same session
#   C. int8 PTQ at the compute-bound stretch shapes (B4, 400x400, outC 4)
#   D. XLA flag sweep on the bf16 step
#   E. 96-scene nuScenes soak at the exact upstream recipe
# ONE TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
RUNS=/root/runs/r3
mkdir -p "$RUNS"
STATUS=$RUNS/measure_status.log
log() { echo "$(date +%F' '%H:%M:%S) $*" >> "$STATUS"; }

for i in $(seq 1 300); do
  grep -q "ALL DONE" "$RUNS/status.log" 2>/dev/null && break
  sleep 60
done
grep -q "ALL DONE" "$RUNS/status.log" || { log "soak batch never finished"; exit 1; }
log "TPU free; starting queue2"

log "0: abl_ema_v2 (ema_batch_stats fix)"
python train_simbev.py --dataroot /tmp/fix48 --bsz 8 --nworkers 3 \
    --val_step 500 --viz_step 0 --resize_lim 0.70 0.85 \
    --compute_dtype bfloat16 --watchdog_secs 300 \
    --logdir "$RUNS/abl_ema_v2" --max_steps 4000 --ema_decay 0.999 \
    > "$RUNS/abl_ema_v2.out" 2>&1
log "0 done rc=$?"

log "A: mbconv_bench (isolated fused vs XLA)"
timeout 3600 python scripts/mbconv_bench.py --iters 50 \
    > "$RUNS/mbconv_bench.json" 2> "$RUNS/mbconv_bench.err"
log "A done rc=$?"

log "B: e2e bf16 step, baseline then --fused_dw"
timeout 3600 python bench.py --mode step --dtype bfloat16 --iters 20 \
    > "$RUNS/step_baseline.json" 2>/dev/null
log "B baseline rc=$?"
timeout 3600 python bench.py --mode step --dtype bfloat16 --iters 20 --fused_dw \
    > "$RUNS/step_fused.json" 2>/dev/null
log "B fused rc=$?"

log "C: stretch int8 vs bf16 inference (B4, 400x400, outC 4)"
timeout 5400 python scripts/stretch_bench.py --mode infer --bsz 4 --iters 10 \
    > "$RUNS/stretch_infer_bf16.json" 2> "$RUNS/stretch_infer_bf16.err"
log "C bf16 rc=$?"
timeout 5400 python scripts/stretch_bench.py --mode infer --bsz 4 --iters 10 --quantize \
    > "$RUNS/stretch_infer_int8.json" 2> "$RUNS/stretch_infer_int8.err"
log "C int8 rc=$?"

log "D: XLA flag sweep (bf16 step)"
timeout 7200 python scripts/xla_flag_sweep.py --dtype bfloat16 --iters 20 \
    > "$RUNS/xla_flag_sweep.json" 2> "$RUNS/xla_flag_sweep.err"
log "D done rc=$?"

log "F: 12k-step cosine soak (the 4k ablation hit 0.7052 — push the headline)"
python train_simbev.py --dataroot /tmp/fix48 --bsz 8 --nworkers 3 \
    --val_step 500 --viz_step 0 --resize_lim 0.70 0.85 \
    --compute_dtype bfloat16 --watchdog_secs 300 \
    --logdir "$RUNS/soak_cosine_12k" --max_steps 12000 \
    --lr_schedule cosine --warmup_steps 500 --decay_steps 12000 \
    > "$RUNS/soak_cosine_12k.out" 2>&1
log "F done rc=$?"

log "E: 96-scene nuScenes soak (upstream recipe)"
timeout 10800 python scripts/train_nuscenes.py --dataroot /tmp/nusc_fix96 \
    --bsz 8 --nworkers 3 --max_steps 6000 --watchdog_secs 300 \
    --logdir "$RUNS/nusc96" > "$RUNS/nusc96.out" 2>&1
log "E done rc=$?"
log "MEASUREMENTS ALL DONE"
