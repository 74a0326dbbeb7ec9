"""Experiment: VAE-decode tiling plans at the 768p bench shape.

The production 768p decode (reference `modeling_causal_vae.py:468-519`
tiling semantics) runs 384px square tiles with 1/8 overlap: positions
stride 42 over a 96x160 latent leave ragged edge tiles (12- and 34-wide),
and total redundancy is 1.25x. Hypotheses, measured here on the real chip:

  H1 uniform planned tiles (exact-cover positions, all tiles one shape)
     remove the ragged-tile programs and some redundancy;
  H2 full-height column strips cut redundancy to 1.04-1.09x (seams on one
     axis only) and keep conv spatial extents large;
  H3 fewer/bigger tiles win as long as they fit HBM next to the resident
     5.8 GB DiT (emulated here with a ballast buffer).

Usage: python tools/exp_vae_tiling.py [--iters N] [--no-ballast]
Prints seconds per variant and a verdict line.
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

from pyramid_flow_tpu.models.vae.model import (  # noqa: E402
    CausalVideoVAE, VAEConfig, chunk_decode, plan_axis, tiled_decode,
    tiled_decode_planned)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _force(out):
    float(jnp.sum(out[:, -1].astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--no-ballast", action="store_true")
    ap.add_argument("--temp", type=int, default=17)
    args = ap.parse_args()

    log(f"devices: {jax.devices()}")
    vae = CausalVideoVAE(config=VAEConfig(), dtype=jnp.bfloat16,
                         param_dtype=jnp.bfloat16)
    t0 = time.time()
    params = jax.jit(vae.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 3), jnp.bfloat16),
        rng=jax.random.PRNGKey(2))
    log(f"init {time.time()-t0:.1f}s")

    ballast = None
    if not args.no_ballast:
        # emulate the resident 5.8 GB DiT of the real 768p bench
        ballast = jax.jit(
            lambda: jnp.ones((int(5.8e9) // 4,), jnp.float32))()
        float(jnp.sum(ballast[:8]))
        log("ballast: 5.8 GB resident")

    z = jax.random.normal(jax.random.PRNGKey(1),
                          (1, args.temp, 96, 160, 16), jnp.bfloat16) * 2.0

    variants = {
        "current_384px_ov8": lambda: tiled_decode(
            vae, params, z, tile_sample_min_size=384, temporal_chunk=True,
            window_size=2, overlap_factor=0.125),
        "planned_48x48": lambda: tiled_decode_planned(
            vae, params, z, 48, 48),
        "strip_h96_w46": lambda: tiled_decode_planned(
            vae, params, z, 96, 46),
        "strip_h96_w58": lambda: tiled_decode_planned(
            vae, params, z, 96, 58),
        "strip_h96_w83": lambda: tiled_decode_planned(
            vae, params, z, 96, 83),
        "untiled_w2": lambda: chunk_decode(vae, params, z, window_size=2),
        "untiled_w1": lambda: chunk_decode(vae, params, z, window_size=1),
        "strip_w83_w1": lambda: tiled_decode_planned(
            vae, params, z, 96, 83, window_size=1),
        "strip_w58_w1": lambda: tiled_decode_planned(
            vae, params, z, 96, 58, window_size=1),
        "strip_w46_w2": lambda: tiled_decode_planned(
            vae, params, z, 96, 46, window_size=2),
    }
    only = os.environ.get("EXP_ONLY")
    if only:
        variants = {k: v for k, v in variants.items()
                    if k in only.split(",")}

    results = {}
    ref_out = None
    for name, fn in variants.items():
        try:
            t0 = time.time()
            out = fn()
            _force(out)
            compile_s = time.time() - t0
            times = []
            for _ in range(args.iters):
                t0 = time.time()
                out = fn()
                _force(out)
                times.append(time.time() - t0)
            sec = min(times)
            assert out.shape[2] == 768 and out.shape[3] == 1280, out.shape
            if ref_out is None:
                ref_out = np.asarray(out[:, -1, ::7, ::11], np.float32)
                diff = 0.0
            else:
                got = np.asarray(out[:, -1, ::7, ::11], np.float32)
                diff = float(np.max(np.abs(got - ref_out)))
            results[name] = sec
            log(f"{name:24s} {sec:8.2f}s  (first+compile {compile_s:.1f}s, "
                f"max seam-diff vs current {diff:.3f})")
        except Exception as e:  # OOM etc.
            log(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            results[name] = None

    base = results.get("current_384px_ov8")
    log("--- verdict ---")
    for name, sec in results.items():
        if sec and base:
            log(f"{name:24s} {sec:8.2f}s  {base/sec:5.2f}x vs current")


if __name__ == "__main__":
    main()
