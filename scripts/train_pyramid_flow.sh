#!/bin/bash
# AR (autoregressive temporal-pyramid) DiT training recipe.
# TPU-native equivalent of the reference `scripts/train_pyramid_flow.sh:23-60`:
# torchrun+FSDP-zero2 becomes a single SPMD program over a (dp, fsdp, sp)
# mesh — set the axis sizes to match your slice (e.g. v5p-8: fsdp=4, sp=2).
#
# Expects pre-extracted VAE latents + text features
# (tools/extract_video_vae_latents.py / tools/extract_text_features.py).

MODEL_NAME=pyramid_flux              # or pyramid_mmdit
ANNO_FILE=annotation/video_text.jsonl
OUTPUT_DIR=runs/dit_ar
MODEL_PATH=${MODEL_PATH:-}           # released checkpoint root to finetune

python tools/train_pyramid_flow.py \
    --model_name "$MODEL_NAME" \
    ${MODEL_PATH:+--model_path "$MODEL_PATH"} \
    --anno_file "$ANNO_FILE" \
    --null_text_fea text_features/null_text.npz \
    --output_dir "$OUTPUT_DIR" \
    --batch_size 4 \
    --max_frames 16 \
    --use_temporal_pyramid \
    --sample_ratios 1 2 1 \
    --frame_per_unit 1 \
    --video_sync_group 8 \
    --learning_rate 5e-5 \
    --weight_decay 1e-4 \
    --clip_grad 1.0 \
    --warmup_steps 1000 \
    --gradient_checkpointing \
    --dp 1 --fsdp 4 --sp 2 \
    --epochs 10 --steps_per_epoch 1000 \
    --auto_resume
