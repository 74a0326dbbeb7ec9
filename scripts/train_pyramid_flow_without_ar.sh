#!/bin/bash
# Non-AR (full-sequence pyramid) training recipe — t2i/t2v without the
# temporal pyramid. TPU-native equivalent of the reference
# `scripts/train_pyramid_flow_without_ar.sh:22-56` (there: --use_flash_attn;
# here the Pallas flash kernel is always on).

MODEL_NAME=pyramid_flux
ANNO_FILE=annotation/video_text.jsonl
OUTPUT_DIR=runs/dit_full_seq

python tools/train_pyramid_flow.py \
    --model_name "$MODEL_NAME" \
    --anno_file "$ANNO_FILE" \
    --output_dir "$OUTPUT_DIR" \
    --batch_size 4 \
    --max_frames 16 \
    --no_temporal_pyramid \
    --sample_ratios 1 2 1 \
    --learning_rate 1e-4 \
    --weight_decay 1e-4 \
    --clip_grad 1.0 \
    --warmup_steps 1000 \
    --gradient_checkpointing \
    --dp 1 --fsdp 8 --sp 1 \
    --epochs 10 --steps_per_epoch 1000 \
    --auto_resume
