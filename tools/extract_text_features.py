#!/usr/bin/env python
"""Batch text-feature extraction (T5 sequence + CLIP pooled) to .npz files.

TPU-native replacement for `tools/extract_text_features.py` (reference):
saves {prompt_embed, prompt_attention_mask, pooled_prompt_embed} per item,
plus the null (empty prompt) embedding used for CFG drop during training.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--model_name", default="pyramid_flux",
                   choices=["pyramid_flux", "pyramid_mmdit"])
    p.add_argument("--anno_file", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--output_anno", required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--world", type=int, default=1)
    return p.parse_args()


def main():
    args = parse_args()
    import jax.numpy as jnp
    import numpy as np

    from pyramid_flow_tpu.data.datasets import load_jsonl
    from pyramid_flow_tpu.models.text.encoder import FluxTextEncoder, SD3TextEncoder
    from pyramid_flow_tpu.utils.checkpoint import load_pretrained_components

    comps = load_pretrained_components(args.model_path, load_vae=False,
                                       model_name=args.model_name)
    if args.model_name == "pyramid_flux":
        te = FluxTextEncoder(comps["clip"], comps["t5"], args.model_path,
                             dtype=jnp.bfloat16)
    else:
        te = SD3TextEncoder(comps["clip"], comps["clip_g"], comps["t5"],
                            args.model_path, dtype=jnp.bfloat16)

    os.makedirs(args.output_dir, exist_ok=True)

    # null embedding for CFG drop
    ne, nm, npl = te("")
    np.savez(os.path.join(args.output_dir, "null_text.npz"),
             prompt_embed=np.asarray(ne[0], np.float32),
             prompt_attention_mask=np.asarray(nm[0]),
             pooled_prompt_embed=np.asarray(npl[0], np.float32))

    items = load_jsonl(args.anno_file)[args.rank:: args.world]
    out_rows = []
    for start in range(0, len(items), args.batch_size):
        chunk = items[start: start + args.batch_size]
        emb, mask, pooled = te([it["text"] for it in chunk])
        for j, it in enumerate(chunk):
            name = f"text_{args.rank}_{start + j:07d}.npz"
            path = os.path.join(args.output_dir, name)
            np.savez(path,
                     prompt_embed=np.asarray(emb[j], np.float32),
                     prompt_attention_mask=np.asarray(mask[j]),
                     pooled_prompt_embed=np.asarray(pooled[j], np.float32))
            row = dict(it)
            row["text_fea"] = path
            out_rows.append(row)
        print(f"[{args.rank}] {start + len(chunk)}/{len(items)}",
              file=sys.stderr)

    with open(args.output_anno, "w") as f:
        for row in out_rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
