#!/bin/bash
# Round-5 TPU queue, part 4: post-queue fixes.
#   I2: stretch eval cross-check rerun (stage I failed on the opt_state
#       structure mismatch, fixed by the weights-only restore fallback)
#   K:  re-probe the implausible G1 vmem16m reading (0.345 ms) with full
#       bench output captured
set -u
cd /root/repo
RUNS=/root/runs/r5
STATUS=$RUNS/status.log
log() { echo "$(date +%F' '%H:%M:%S) $*" >> "$STATUS"; }

# NOTE (post-mortem): the original gate grepped for "ALL DONE" — which
# matched this script's OWN "waiting for r5d ALL DONE" log line, so r5e
# started while stage J still held the chip (wall-time contention only;
# results were unaffected, disclosed in ACCURACY.md). Anchor the pattern
# to the producer's exact line instead:
log "r5e: waiting for r5d queue-done marker"
while ! grep -qx '.*[0-9] ALL DONE' "$STATUS"; do sleep 15; done
log "r5e: queue clear"

CKPT="$RUNS/stretch4k_pw/ckpts"
log "I2: stretch eval_model_iou cross-check rerun ($CKPT)"
timeout -k 60 1800 python -m lss_carla_tpu.explore eval_model_iou \
    --dataroot /tmp/fix_stretch --checkpoint "$CKPT" --best \
    --variant b4 --xbound -50 50 0.25 --ybound -50 50 0.25 \
    --label_mode multiclass --label_classes 0 1 2 3 --bsz 4 \
    > "$RUNS/stretch_eval2.out" 2>&1
log "I2 rc=$?"

log "K: vmem16m f32-bsz16 re-probe (full output)"
timeout -k 60 1500 python bench.py --mode step --dtype float32 --bsz 16 \
    --iters 10 --compiler_option xla_tpu_scoped_vmem_limit_kib=16384 \
    > "$RUNS/vmem16_reprobe.out" 2>&1
log "K rc=$?"
log "r5e ALL DONE"
