#!/usr/bin/env python
"""Minimal runnable demo (the notebook-equivalents of the reference).

Runs on CPU with a tiny randomly-initialized model so it works anywhere —
swap the configs + `load_pretrained_components` for real generation (see
tools/inference.py). Demonstrates the three reference notebook flows:
  1. image generation (temp=1, three aspect ratios)
  2. text-to-video with the AR pyramid loop
  3. VAE roundtrip with chunked streaming

Usage: python examples/demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp
import numpy as np

from pyramid_flow_tpu.models.flux.model import FluxConfig, PyramidFluxTransformer
from pyramid_flow_tpu.models.vae.model import (
    CausalVideoVAE, VAEConfig, chunk_decode, chunk_encode, gaussian_mode,
    reconstruct)
from pyramid_flow_tpu.pipeline.pyramid_pipeline import PyramidFlowPipeline

DIT_CFG = FluxConfig(
    in_channels=16, num_layers=2, num_single_layers=2, attention_head_dim=8,
    num_attention_heads=4, joint_attention_dim=64, pooled_projection_dim=32,
    axes_dims_rope=(4, 2, 2))
VAE_CFG = VAEConfig(
    latent_channels=4, block_out_channels=(8, 8, 16, 16),
    encoder_layers_per_block=(1, 1, 1, 1), decoder_layers_per_block=(1, 1, 1, 1),
    num_groups=4)


def main():
    rng = jax.random.PRNGKey(0)
    dit = PyramidFluxTransformer(config=DIT_CFG, dtype=jnp.float32)
    params = dit.init(
        rng, jnp.zeros((2, 16, 16)), jnp.zeros((2, 16, 3)),
        jnp.zeros((2, 16), jnp.int32), jnp.zeros((2, 8, 64)),
        jnp.ones((2, 8), bool), jnp.zeros((2, 32)), jnp.zeros((2,)))
    vae = CausalVideoVAE(config=VAE_CFG)
    vae_params = vae.init(rng, jnp.zeros((1, 1, 32, 32, 3)), rng=rng)
    pipe = PyramidFlowPipeline(dit, params, vae, vae_params,
                               latent_channels=4, dtype=jnp.float32)

    emb = jax.random.normal(rng, (1, 8, 64))
    mask = jnp.ones((1, 8), bool)
    pooled = jax.random.normal(rng, (1, 32))

    # 1. image generation at three aspect ratios (image_generation_demo)
    for (h, w) in [(64, 64), (64, 128), (128, 64)]:
        img = pipe.generate(
            jax.random.PRNGKey(1), emb, mask, pooled, emb * 0, mask, pooled * 0,
            height=h, width=w, temp=1, num_inference_steps=[4, 4, 4],
            guidance_scale=7.0, output_type="pixels")
        print(f"image {h}x{w}: frames {np.asarray(img).shape}")

    # 2. text-to-video AR loop (video_generation_demo)
    vid = pipe.generate(
        jax.random.PRNGKey(2), emb, mask, pooled, emb * 0, mask, pooled * 0,
        height=64, width=64, temp=3, num_inference_steps=[4, 4, 4],
        video_num_inference_steps=[2, 2, 2], guidance_scale=7.0,
        video_guidance_scale=5.0, use_linear_guidance=True,
        output_type="pixels")
    print(f"t2v temp=3: frames {np.asarray(vid).shape}")

    # 3. VAE chunked roundtrip (causal_video_vae_demo: encode w8 / decode w2)
    clip = jax.random.normal(jax.random.PRNGKey(3), (1, 17, 32, 32, 3)) * 0.3
    moments = chunk_encode(vae, vae_params, clip, window_size=8)
    recon = chunk_decode(vae, vae_params, gaussian_mode(moments), window_size=2)
    print(f"vae roundtrip: {clip.shape} -> latent {moments.shape[:-1] + (moments.shape[-1]//2,)} -> {recon.shape}")
    recon2 = reconstruct(vae, vae_params, clip, window_size=8)
    assert recon2.shape == recon.shape


if __name__ == "__main__":
    main()
