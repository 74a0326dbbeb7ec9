#!/usr/bin/env python
"""Batch VAE latent extraction (offline preprocessing for DiT training).

TPU-native replacement for `tools/extract_video_vae_latents.py` (reference):
the torchrun rank loop becomes host-index dataset sharding; chunked encode
(window 16) with optional spatial tiling; async .npy saves via a thread pool.
Output jsonl rows gain a ``latent`` field consumable by
``LengthGroupedVideoTextDataset``.
"""

import argparse
import json
import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--anno_file", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--output_anno", required=True)
    p.add_argument("--num_frames", type=int, default=121)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--window_size", type=int, default=16)
    p.add_argument("--tile", type=int, default=0,
                   help="spatial tile size (0 = no tiling)")
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--world", type=int, default=1)
    return p.parse_args()


def main():
    args = parse_args()
    import jax.numpy as jnp
    import numpy as np

    from pyramid_flow_tpu.data.datasets import VideoFrameProcessor, load_jsonl
    from pyramid_flow_tpu.models.vae.model import (
        CausalVideoVAE, VAEConfig, chunk_encode, gaussian_sample, tiled_encode)
    from pyramid_flow_tpu.utils.checkpoint import load_pretrained_components
    import jax

    comps = load_pretrained_components(args.model_path, load_vae=True)
    vae = CausalVideoVAE(config=VAEConfig(), dtype=jnp.bfloat16)
    vae_params = comps["vae"]

    items = load_jsonl(args.anno_file)[args.rank:: args.world]
    proc = VideoFrameProcessor(args.num_frames, (args.height, args.width))
    os.makedirs(args.output_dir, exist_ok=True)
    pool = ThreadPoolExecutor(max_workers=4)
    rng = jax.random.PRNGKey(0)

    out_rows = []
    for i, item in enumerate(items):
        try:
            video, _ = proc(item["video"])
        except Exception as e:
            print(f"skip {item['video']}: {e}", file=sys.stderr)
            continue
        x = jnp.asarray(video)[None]
        if args.tile:
            moments = tiled_encode(vae, vae_params, x, args.tile,
                                   temporal_chunk=True,
                                   window_size=args.window_size)
        else:
            moments = chunk_encode(vae, vae_params, x, args.window_size)
        rng, sub = jax.random.split(rng)
        latent = np.asarray(gaussian_sample(moments, sub)[0], np.float32)

        name = f"latent_{args.rank}_{i:07d}.npy"
        path = os.path.join(args.output_dir, name)
        pool.submit(np.save, path, latent)
        row = dict(item)
        row["latent"] = path
        out_rows.append(row)
        if i % 20 == 0:
            print(f"[{args.rank}] {i}/{len(items)} latent={latent.shape}",
                  file=sys.stderr)

    pool.shutdown(wait=True)
    with open(args.output_anno, "w") as f:
        for row in out_rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
