#!/bin/bash
# Two-stage causal-VAE training recipe (reference
# `scripts/train_causal_video_vae.sh:19-89`):
#   stage 1 — mixed image/video, 17 frames @ 256p, no context parallelism
#   stage 2 — long-clip finetune; the reference uses CP size 2
#             (`scripts/train_causal_video_vae.sh:53-57`), here `--cp 2`
#             shards the time axis over 2 devices with per-conv halo
#             exchange (ppermute) inside the jitted GAN step. CP clips use
#             continuation (is_init=False) semantics, so num_frames must be
#             divisible by 8*cp — 32 here vs the reference's 33 (its rank-0
#             shard carries the odd lone first frame; uniform SPMD shards
#             cannot, and the clip start still sees zero history).
# Loss weights: kl 1e-12, pixel 10, lpips 1, disc 0.5, disc_start 250k.

VIDEO_ANNO=annotation/video_text.jsonl
IMAGE_ANNO=annotation/image_text.jsonl
LPIPS_CKPT=${LPIPS_CKPT:-vgg_lpips.pth}

# ---- stage 1: 17 frames, mixed image/video ----
python tools/train_video_vae.py \
    --video_anno "$VIDEO_ANNO" \
    --image_anno "$IMAGE_ANNO" \
    --image_mix_ratio 0.1 \
    --resolution 256 --num_frames 17 \
    --batch_size 1 \
    --learning_rate 1e-4 \
    --kl_weight 1e-12 --pixel_weight 10.0 --perceptual_weight 1.0 \
    --disc_weight 0.5 --disc_start 250000 \
    --lpips_ckpt "$LPIPS_CKPT" \
    --output_dir runs/vae_stage1 \
    --epochs 10 --steps_per_epoch 2000

# ---- stage 2: long-clip finetune from stage 1, context-parallel over time ----
python tools/train_video_vae.py \
    --video_anno "$VIDEO_ANNO" \
    --resolution 256 --num_frames 32 \
    --cp 2 \
    --batch_size 1 \
    --learning_rate 5e-5 \
    --kl_weight 1e-12 --pixel_weight 10.0 --perceptual_weight 1.0 \
    --disc_weight 0.5 --disc_start 0 \
    --lpips_ckpt "$LPIPS_CKPT" \
    --pretrained_vae runs/vae_stage1 \
    --output_dir runs/vae_stage2 \
    --epochs 5 --steps_per_epoch 2000
