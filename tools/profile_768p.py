"""768p single-chip hot-path breakdown (VERDICT r1 item #2).

Times, on the real chip at the WORST-CASE shapes (final AR unit of a
5s@768x1280 generation):
  1. one full DiT forward per stage (the denoise step body),
  2. the flash-attention kernel alone at the same [B=2, H=24, L, 64] shapes
     (x57 block calls) -> attention vs linear split,
  3. optional block-size sweep for the kernel at the stage-2 length,
  4. the chunked+tiled VAE decode of the full 17-frame latent.

Usage: python tools/profile_768p.py [--sweep] [--trace DIR]
"""

import argparse
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _force(out):
    """jax.block_until_ready is a NO-OP on the tunneled axon platform —
    force a (tiny) host transfer instead, which orders behind the queue."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _force(out)  # ~27 ms round-trip constant, amortized over iters
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true",
                    help="flash block-size sweep at stage-2 length")
    ap.add_argument("--trace", default=None,
                    help="jax.profiler trace dir for one stage-2 forward")
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--unit", type=int, default=15)
    ap.add_argument("--skip-vae", action="store_true")
    args = ap.parse_args()

    from pyramid_flow_tpu.models.flux.model import (
        FluxConfig, PyramidFluxTransformer)
    from pyramid_flow_tpu.models.vae.model import CausalVideoVAE, VAEConfig
    from pyramid_flow_tpu.ops.flash_attention import (
        INVALID_TIME, flash_attention)
    from pyramid_flow_tpu.pipeline.pyramid_pipeline import PyramidFlowPipeline

    cfg = FluxConfig()
    dit = PyramidFluxTransformer(config=cfg, dtype=jnp.bfloat16,
                                 param_dtype=jnp.bfloat16)
    b = 1
    tok = jnp.zeros((b, 64, cfg.in_channels), jnp.bfloat16)
    params = jax.jit(dit.init)(
        jax.random.PRNGKey(0), tok, jnp.zeros((b, 64, 3)),
        jnp.zeros((b, 64), jnp.int32),
        jnp.zeros((b, 128, cfg.joint_attention_dim), jnp.bfloat16),
        jnp.ones((b, 128), bool),
        jnp.zeros((b, cfg.pooled_projection_dim), jnp.bfloat16),
        jnp.zeros((b,)))

    pipe = PyramidFlowPipeline(dit, params, None, None, latent_channels=16)
    h_lat, w_lat = args.height // 8, args.width // 8
    budgets = pipe._cond_token_budget(args.unit, h_lat, w_lat)
    log(f"unit {args.unit} budgets per stage: {budgets}")

    from pyramid_flow_tpu.pipeline.packing import clip_metadata

    apply_jit = jax.jit(dit.apply)
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    rng = jax.random.PRNGKey(1)

    stage_times = []
    attn_times = []
    for i_s in range(3):
        h = h_lat >> (2 - i_s)
        w = w_lat >> (2 - i_s)
        shapes = pipe._stage_clip_shapes(b, h_lat, w_lat, args.unit, i_s)
        shapes.append((b, 1, h, w, 16))
        positions, time_ids, trainable = clip_metadata(shapes)
        lc = positions.shape[0] - trainable
        pad = budgets[i_s] - lc
        # pad BETWEEN cond and current, matching generate_one_unit's layout
        positions = np.concatenate(
            [positions[:lc], np.zeros((pad, 3), np.float32), positions[lc:]])
        time_ids = np.concatenate(
            [time_ids[:lc], np.full((pad,), INVALID_TIME, np.int32),
             time_ids[lc:]])
        L = positions.shape[0]

        tokens = jax.random.normal(rng, (2 * b, L, 64), jnp.bfloat16)
        pos2 = jnp.broadcast_to(jnp.asarray(positions)[None],
                                (2 * b, L, 3))
        time2 = jnp.broadcast_to(jnp.asarray(time_ids)[None], (2 * b, L))
        text = jax.random.normal(rng, (2 * b, 128, 4096), jnp.bfloat16)
        mask = jnp.ones((2 * b, 128), bool)
        pooled = jax.random.normal(rng, (2 * b, 768), jnp.bfloat16)
        ts = jnp.full((2 * b,), 500.0)

        dt = timeit(lambda *a: apply_jit(params, *a),
                    tokens, pos2, time2, text, mask, pooled, ts)
        stage_times.append(dt)

        # attention-only at the same shape (text+latent length)
        La = L + 128
        q = jax.random.normal(rng, (2 * b, nh, La, hd), jnp.bfloat16)
        tq = jnp.concatenate([jnp.zeros((2 * b, 128), jnp.int32),
                              time2.astype(jnp.int32)], axis=1)
        fa = jax.jit(lambda q, t: flash_attention(q, q, q, t, causal=True))
        at = timeit(fa, q, tq)
        attn_times.append(at)

        # FLOPs: linear ~ (19*(4+2*... ) simplified) — report measured only
        log(f"stage {i_s}: L={L}+128 | dit fwd {dt*1e3:.1f} ms | "
            f"flash x1 {at*1e3:.2f} ms | flash x57 {at*57*1e3:.1f} ms "
            f"({at*57/dt*100:.0f}% of fwd)")

    log(f"stage fwd times {[f'{t*1e3:.1f}ms' for t in stage_times]}")

    if args.trace:
        h = h_lat
        w = w_lat
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                jax.block_until_ready(apply_jit(
                    params, tokens, pos2, time2, text, mask, pooled, ts))
        log(f"trace written to {args.trace}")

    if args.sweep:
        i_s = 2
        La = budgets[2] + (h_lat // 2) * (w_lat // 2) + 128
        q = jax.random.normal(rng, (2, nh, La, hd), jnp.bfloat16)
        tq = jnp.concatenate([
            jnp.zeros((2, 128), jnp.int32),
            jnp.asarray(time_ids)[None].repeat(2, 0)], axis=1)
        for bq in (256, 512, 1024, 2048):
            for bk in (512, 1024, 2048, 4096):
                try:
                    fa = jax.jit(lambda q, t: flash_attention(
                        q, q, q, t, causal=True, block_q=bq, block_k=bk))
                    at = timeit(fa, q, tq)
                    log(f"sweep L={La} bq={bq} bk={bk}: {at*1e3:.2f} ms")
                except Exception as e:
                    log(f"sweep bq={bq} bk={bk}: FAILED {type(e).__name__}")

    if not args.skip_vae:
        vae = CausalVideoVAE(config=VAEConfig(), dtype=jnp.bfloat16,
                             param_dtype=jnp.bfloat16)
        vp = jax.jit(vae.init)(
            jax.random.PRNGKey(2), jnp.zeros((1, 1, 64, 64, 3), jnp.bfloat16),
            rng=jax.random.PRNGKey(3))
        pipe_v = PyramidFlowPipeline(dit, params, vae, vp, latent_channels=16)
        z = jax.random.normal(rng, (1, 17, h_lat, w_lat, 16), jnp.float32)
        t0 = time.time()
        _force(pipe_v.decode_latent(z, save_memory=True))
        log(f"vae decode warmup(+compile): {time.time()-t0:.1f}s")
        t0 = time.time()
        _force(pipe_v.decode_latent(z, save_memory=True))
        log(f"vae decode steady: {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
