#!/bin/bash
# Round-3 session-3 TPU batch. ONE TPU process at a time.
#   V. fused_dw drive (verify + VERDICT item 4): bench --fused_dw
#   W. isolated mbconv bench (fixed carry dtype)
set -u
cd /root/repo
RUNS=/root/runs/r3c
mkdir -p "$RUNS"
STATUS=$RUNS/status.log
log() { echo "$(date +%F' '%H:%M:%S) $*" >> "$STATUS"; }

log "V: bench --fused_dw"
timeout 3600 python bench.py --mode step --dtype bfloat16 --iters 20 --fused_dw \
    > "$RUNS/step_fused.json" 2> "$RUNS/step_fused.err"
log "V rc=$?"

log "W: mbconv_bench"
timeout 3600 python scripts/mbconv_bench.py --iters 50 \
    > "$RUNS/mbconv_bench.json" 2> "$RUNS/mbconv_bench.err"
log "W rc=$?"
log "ALL DONE"
