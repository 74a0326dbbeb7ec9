#!/bin/bash
# Batch-extract text-encoder features for DiT training (reference
# `scripts/extract_text_feature.sh`). Pre-extracting the T5/CLIP features
# keeps the encoders out of training HBM entirely.
#
# TPU-native equivalent: torchrun's per-GPU sharding becomes the tool's
# --rank/--world host sharding — one process per host/chip, each taking
# every world-th annotation row.

WORLD=${WORLD:-1}                # total extractor processes
RANK=${RANK:-0}                  # this process's shard index
MODEL_NAME=pyramid_flux          # `pyramid_flux` or `pyramid_mmdit`
MODEL_PATH=/PATH/pyramid-flow-miniflux   # released ckpt root (must match MODEL_NAME)
ANNO_FILE=annotation/video_text.jsonl    # video-text annotation file
OUTPUT_DIR=text_features
OUTPUT_ANNO=annotation/video_text_textfea.jsonl

python tools/extract_text_features.py \
    --model_path "$MODEL_PATH" \
    --model_name "$MODEL_NAME" \
    --anno_file "$ANNO_FILE" \
    --output_dir "$OUTPUT_DIR" \
    --output_anno "$OUTPUT_ANNO" \
    --batch_size 1 \
    --rank "$RANK" \
    --world "$WORLD"
