#!/bin/bash
# Batch-extract video VAE latents for DiT training (reference
# `scripts/extract_vae_latent.sh`). Pre-extracting latents removes the VAE
# encode from the training hot loop.
#
# TPU-native equivalent: torchrun's 8-process data parallelism becomes the
# tool's --rank/--world host sharding — run one process per host (or one per
# chip via separate invocations), each taking every world-th annotation row.

WORLD=${WORLD:-1}                # total extractor processes
RANK=${RANK:-0}                  # this process's shard index
VAE_MODEL_PATH=/PATH/pyramid-flow-miniflux/causal_video_vae  # VAE ckpt dir
ANNO_FILE=annotation/video_text.jsonl   # video annotation file
OUTPUT_DIR=latents
OUTPUT_ANNO=annotation/video_text_latent.jsonl
WIDTH=640
HEIGHT=384
NUM_FRAMES=121

python tools/extract_video_vae_latents.py \
    --model_path "$VAE_MODEL_PATH" \
    --anno_file "$ANNO_FILE" \
    --output_dir "$OUTPUT_DIR" \
    --output_anno "$OUTPUT_ANNO" \
    --width $WIDTH \
    --height $HEIGHT \
    --num_frames $NUM_FRAMES \
    --rank "$RANK" \
    --world "$WORLD"
