#!/bin/bash
# Stretch config (BASELINE.json): 400x400 BEV at 0.25 m, multiclass labels
# (drivable + 3 vehicle classes), EfficientNet-B4 trunk, bf16 compute,
# 8-chip data parallelism. No reference equivalent — this is the TPU-native
# scale-up target; measured ~100 ms/step at bsz 4 per chip on v5e (bf16,
# see CLAUDE.md). On a single chip drop --n_devices and keep bsz small.

DATAROOT="${DATAROOT:-/data/SimBEV}"

EPOCHS=30
BATCH_SIZE="${BATCH_SIZE:-32}"     # global batch over 8 chips (4/chip)
NUM_WORKERS=16
LEARNING_RATE=0.001

IMAGE_H=224
IMAGE_W=480
FINAL_H=128
FINAL_W=352
NUM_CAMS=6

LOGDIR="${LOGDIR:-./runs/simbev_stretch_$(date +%Y%m%d_%H%M%S)}"

python train_simbev.py \
    --dataroot "$DATAROOT" \
    --nepochs $EPOCHS \
    --bsz $BATCH_SIZE \
    --nworkers $NUM_WORKERS \
    --lr $LEARNING_RATE \
    --H $IMAGE_H \
    --W $IMAGE_W \
    --final_h $FINAL_H \
    --final_w $FINAL_W \
    --ncams $NUM_CAMS \
    --xbound -50.0 50.0 0.25 \
    --ybound -50.0 50.0 0.25 \
    --label_mode multiclass \
    --variant b4 \
    --compute_dtype bfloat16 \
    --n_devices 8 \
    --lr_schedule cosine \
    --warmup_steps 500 \
    --logdir "$LOGDIR" \
    --val_step 2000 \
    --save_step 2000
