#!/bin/bash
# SimBEV fast recipe — the measured-best fixed-length config on one v5e
# (no reference equivalent; the reference trains constant-LR f32 only,
# reference train_simbev.py:463-538 has no schedule flags).
#
# Measured (docs/ACCURACY.md, training-extras ablations): best val IoU
# 0.712 +/- 0.005 over 5 runs, 4 seeds (best single run 0.7186) at 4000 steps — above the 12k-step constant-LR baseline
# (0.6914 bf16 / 0.7000 f32) in a third of the steps. bf16 step ~38 ms
# at bsz 8 (21x the 800 ms baseline floor).
#
# Optional: add `--ema_decay 0.999` — measured 0.7167 composed (top of
# the seed band, not beyond it): EMA buys a smoother validation
# trajectory under the schedule, not extra peak (ACCURACY.md ablations).
#
# The scale-robust --resize_lim matters on SimBEV-style data: the
# reference's no-aug defaults leave a train/val resize-scale shift that
# stalls val IoU near zero (docs/TRAINING_GUIDE.md).

DATAROOT="${DATAROOT:-/path/to/simbev/dataset}"
LOGDIR="${LOGDIR:-./runs/simbev_fast_$(date +%Y%m%d_%H%M%S)}"

MAX_STEPS=4000

python train_simbev.py \
    --dataroot "$DATAROOT" \
    --bsz 8 \
    --nworkers 4 \
    --compute_dtype bfloat16 \
    --resize_lim 0.70 0.85 \
    --lr_schedule cosine \
    --warmup_steps 500 \
    --decay_steps $MAX_STEPS \
    --max_steps $MAX_STEPS \
    --logdir "$LOGDIR" \
    --val_step 500 \
    --save_step 1000
