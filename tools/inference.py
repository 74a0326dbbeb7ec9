#!/usr/bin/env python
"""Text/image-to-video inference CLI.

TPU-native replacement for `inference_multigpu.py` + the notebook flows:
single-program SPMD replaces torchrun — sequence parallelism is a mesh
config, not a process launcher. Frames export as PNGs (and .mp4 when an
ffmpeg encoder is available).

Examples:
  python tools/inference.py --model_path /ckpts/pyramid-flow-miniflux \
      --variant diffusion_transformer_384p --prompt "a hiker on a ridge" \
      --temp 16 --height 384 --width 640 --output out/

  python tools/inference.py ... --sp 4        # 4-way sequence parallelism
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True,
                   help="released checkpoint root (HF snapshot layout)")
    p.add_argument("--variant", default="diffusion_transformer_768p")
    p.add_argument("--model_name", default="pyramid_flux",
                   choices=["pyramid_flux", "pyramid_mmdit"])
    p.add_argument("--prompt", default="")
    p.add_argument("--negative_prompt", default=(
        "cartoon style, worst quality, low quality, blurry, absolute black, "
        "absolute white, low res, extra limbs, extra digits, misplaced "
        "objects, mutated anatomy, monochrome, horror"))
    p.add_argument("--input_image", default=None, help="i2v input image path")
    p.add_argument("--temp", type=int, default=16,
                   help="latent temporal units; frames = temp*8+1")
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--num_inference_steps", type=int, default=20)
    p.add_argument("--video_num_inference_steps", type=int, default=10)
    p.add_argument("--guidance_scale", type=float, default=9.0)
    p.add_argument("--video_guidance_scale", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sp", type=int, default=1, help="sequence-parallel ways")
    p.add_argument("--save_memory", action="store_true")
    p.add_argument("--output", default="output")
    p.add_argument("--fps", type=int, default=24)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    from pyramid_flow_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed()
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from pyramid_flow_tpu.models.flux.model import FluxConfig, PyramidFluxTransformer
    from pyramid_flow_tpu.models.mmdit.model import MMDiTConfig, PyramidDiffusionMMDiT
    from pyramid_flow_tpu.models.text.encoder import FluxTextEncoder, SD3TextEncoder
    from pyramid_flow_tpu.models.vae.model import CausalVideoVAE, VAEConfig, chunk_encode, gaussian_sample
    from pyramid_flow_tpu.parallel.mesh import MeshConfig, make_mesh
    from pyramid_flow_tpu.pipeline.pyramid_pipeline import PyramidFlowPipeline
    from pyramid_flow_tpu.utils.checkpoint import load_pretrained_components

    mesh = None
    if args.sp > 1:
        n = len(jax.devices())
        assert n % args.sp == 0, (n, args.sp)
        mesh = make_mesh(MeshConfig(dp=1, fsdp=n // args.sp, sp=args.sp))

    print(f"loading checkpoints from {args.model_path} ...", file=sys.stderr)
    comps = load_pretrained_components(
        args.model_path, args.variant, args.model_name)
    assert "dit" in comps, f"no DiT weights under {args.model_path}/{args.variant}"

    dtype = jnp.bfloat16
    if args.model_name == "pyramid_flux":
        dit = PyramidFluxTransformer(config=FluxConfig(), dtype=dtype, mesh=mesh)
    else:
        dit = PyramidDiffusionMMDiT(config=MMDiTConfig(), dtype=dtype, mesh=mesh)

    vae = CausalVideoVAE(config=VAEConfig(), dtype=dtype)
    pipe = PyramidFlowPipeline(
        dit, comps.pop("dit"), vae, comps.get("vae"),
        model_name=args.model_name, dtype=dtype)

    # text encoding
    if args.model_name == "pyramid_flux":
        te = FluxTextEncoder(comps["clip"], comps["t5"], args.model_path, dtype=dtype)
    else:
        te = SD3TextEncoder(comps["clip"], comps["clip_g"], comps["t5"],
                            args.model_path, dtype=dtype)
    prompt = args.prompt + ", hyper quality, Ultra HD, 8K"
    emb, mask, pooled = te(prompt)
    nemb, nmask, npooled = te(args.negative_prompt or "")

    rng = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    common = dict(
        height=args.height, width=args.width, temp=args.temp,
        num_inference_steps=args.num_inference_steps,
        video_num_inference_steps=args.video_num_inference_steps,
        guidance_scale=args.guidance_scale,
        video_guidance_scale=args.video_guidance_scale,
        output_type="pixels", save_memory=args.save_memory,
        # one-shot CLI: drop the DiT from HBM before VAE decode (the
        # reference's pre-decode CPU offload, pipeline :1208-1216) so the
        # decode gets the less-redundant memory plan
        release_dit_before_decode=True,
    )
    if args.input_image:
        img = Image.open(args.input_image).convert("RGB").resize(
            (args.width, args.height))
        px = (np.asarray(img).astype(np.float32) / 127.5 - 1.0)[None, None]
        moments = chunk_encode(vae, comps["vae"], jnp.asarray(px), window_size=16)
        rng, sub = jax.random.split(rng)
        img_latent = gaussian_sample(moments, sub)
        frames = pipe.generate_i2v(rng, img_latent, emb, mask, pooled,
                                   nemb, nmask, npooled, **common)
    else:
        frames = pipe.generate(rng, emb, mask, pooled, nemb, nmask, npooled,
                               **common)
    frames = np.asarray(frames)[0]  # [F, H, W, 3] uint8
    print(f"generated {frames.shape[0]} frames in {time.time()-t0:.1f}s",
          file=sys.stderr)

    os.makedirs(args.output, exist_ok=True)
    for i, f in enumerate(frames):
        Image.fromarray(f).save(os.path.join(args.output, f"frame_{i:04d}.png"))
    try:
        import imageio
        imageio.mimwrite(os.path.join(args.output, "video.mp4"), list(frames),
                         fps=args.fps)
        print(f"wrote {args.output}/video.mp4", file=sys.stderr)
    except Exception as e:
        print(f"(mp4 export unavailable: {e}; PNG frames written)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
