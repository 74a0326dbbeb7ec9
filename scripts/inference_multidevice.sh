#!/bin/bash
# Multi-chip sequence-parallel inference (reference `inference_multigpu.py`
# + `scripts/app_multigpu_engine.sh`): no torchrun — SP is a mesh axis in
# one SPMD program. --sp must divide the local device count.

MODEL_PATH=${MODEL_PATH:?set MODEL_PATH to the released checkpoint root}
VARIANT=${VARIANT:-diffusion_transformer_768p}
SP=${SP:-4}

python tools/inference.py \
    --model_path "$MODEL_PATH" \
    --variant "$VARIANT" \
    --model_name pyramid_flux \
    --prompt "A movie trailer featuring the adventures of the 30 year old space man wearing a red wool knitted motorcycle helmet, blue sky, salt desert, cinematic style, shot on 35mm film, vivid colors" \
    --temp 16 --height 768 --width 1280 \
    --num_inference_steps 20 --video_num_inference_steps 10 \
    --guidance_scale 7.0 --video_guidance_scale 5.0 \
    --sp "$SP" \
    --output out/
