#!/bin/bash
# Round-4c TPU queue — extra measured work after the r4b queue drains.
#   G. EMA + cosine combined 4k (candidate best fixed-length recipe)
#   H. scoped-VMEM probe at the diagnosed batch-size cliffs
#      (f32 bsz 16 step 217 ms; bf16 bsz 32 inference 8.7 ms/sample —
#       ROADMAP item 3 said "compiler VMEM-tiling effect"; the sweep's
#       lever is the direct test of that diagnosis)
#   I. resnet18 + cosine 4k (does the fast recipe transfer to the MXU
#      trunk? Soak E reached 0.680 in 4k with constant LR)
set -u
cd /root/repo
RUNS=/root/runs/r4b
mkdir -p "$RUNS"
STATUS=$RUNS/status.log
log() { echo "$(date +%F' '%H:%M:%S) $*" >> "$STATUS"; }

log "r4c: waiting for r4b stage E"
while ! grep -q "E rc=" "$STATUS" 2>/dev/null; do sleep 30; done

log "G: EMA + cosine combined 4k"
timeout 10800 python train_simbev.py --dataroot /tmp/fix48 --bsz 8 \
    --nworkers 3 --val_step 500 --viz_step 0 --resize_lim 0.70 0.85 \
    --compute_dtype bfloat16 --watchdog_secs 300 --supervise 3 \
    --logdir "$RUNS/abl_emacos4k" --max_steps 4000 \
    --lr_schedule cosine --warmup_steps 500 --decay_steps 4000 \
    --ema_decay 0.999 \
    > "$RUNS/abl_emacos4k.out" 2>&1
log "G rc=$?"

log "H: scoped-VMEM probe at the cliffs"
for cfg in "f32b16 --mode step --dtype float32 --bsz 16" \
           "f32b16v32 --mode step --dtype float32 --bsz 16 --compiler_option xla_tpu_scoped_vmem_limit_kib=32768" \
           "f32b16v16 --mode step --dtype float32 --bsz 16 --compiler_option xla_tpu_scoped_vmem_limit_kib=16384" \
           "inf32 --mode infer --dtype bfloat16 --bsz 32" \
           "inf32v32 --mode infer --dtype bfloat16 --bsz 32 --compiler_option xla_tpu_scoped_vmem_limit_kib=32768"; do
    name=${cfg%% *}; args=${cfg#* }
    timeout 3600 python bench.py $args --iters 20 \
        > "$RUNS/cliff_$name.json" 2> "$RUNS/cliff_$name.err"
    log "H $name rc=$?"
done

log "I: resnet18 + cosine 4k"
timeout 10800 python train_simbev.py --dataroot /tmp/fix48 --bsz 8 \
    --nworkers 3 --val_step 500 --viz_step 0 --resize_lim 0.70 0.85 \
    --compute_dtype bfloat16 --watchdog_secs 300 --supervise 3 \
    --variant resnet18 \
    --logdir "$RUNS/abl_r18cos4k" --max_steps 4000 \
    --lr_schedule cosine --warmup_steps 500 --decay_steps 4000 \
    > "$RUNS/abl_r18cos4k.out" 2>&1
log "I rc=$?"
log "r4c ALL DONE"
