"""Experiment: per-window dispatch overhead in the chunked VAE decode.

The 768p decode issues ~96 sequential window programs (12 tiles x 8
windows). If each dispatch leaves dead device time (a real risk behind the
axon tunnel, where async dispatch semantics are nonstandard), folding the
uniform continuation windows into ONE ``lax.scan`` program per tile should
show it directly: same math, 2 dispatches per tile instead of 9.

Usage: python tools/exp_decode_scan.py [--iters N]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyramid_flow_tpu.models.vae.model import (  # noqa: E402
    CausalVideoVAE, VAEConfig, chunk_decode)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _force(out):
    float(jnp.sum(out[:, -1].astype(jnp.float32)))


def make_scan_decode(model):
    def init_fn(variables, z0):
        return model.apply(
            variables, z0, is_init=True, temporal_chunk=True,
            method=model.decode, mutable=["cache"])

    def scan_fn(variables, cache0, zw):
        def body(cache, zi):
            v = dict(variables)
            v["cache"] = cache
            out, mut = model.apply(
                v, zi, is_init=False, temporal_chunk=True,
                method=model.decode, mutable=["cache"])
            return mut["cache"], out

        cache_f, outs = jax.lax.scan(body, cache0, zw)
        # [nw, B, tw, H, W, 3] -> [B, nw*tw, H, W, 3]
        nw, b, tw = outs.shape[0], outs.shape[1], outs.shape[2]
        return jnp.moveaxis(outs, 0, 1).reshape(
            (b, nw * tw) + outs.shape[3:]), cache_f

    return (jax.jit(init_fn),
            jax.jit(scan_fn, donate_argnums=(1,)))


def scan_chunk_decode(model, variables, z, window: int = 2,
                      jits=None):
    init_fn, scan_fn = jits
    out0, mut = init_fn(variables, z[:, :1])
    nw = (z.shape[1] - 1) // window
    main = z[:, 1:1 + nw * window]
    zw = jnp.stack([main[:, i * window:(i + 1) * window]
                    for i in range(nw)], axis=0)
    outs, cache = scan_fn(variables, mut["cache"], zw)
    parts = [out0, outs]
    rem = z[:, 1 + nw * window:]
    if rem.shape[1]:
        # leftover tail window (temp not divisible): plain dispatch
        out_r, _ = jax.jit(
            lambda v, c, x: model.apply(
                dict(v, cache=c), x, is_init=False, temporal_chunk=True,
                method=model.decode, mutable=["cache"]))(variables, cache, rem)
        parts.append(out_r)
    return jnp.concatenate(parts, axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--temp", type=int, default=17)
    args = ap.parse_args()

    log(f"devices: {jax.devices()}")
    vae = CausalVideoVAE(config=VAEConfig(), dtype=jnp.bfloat16,
                         param_dtype=jnp.bfloat16)
    params = jax.jit(vae.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 3), jnp.bfloat16),
        rng=jax.random.PRNGKey(2))

    z = jax.random.normal(jax.random.PRNGKey(1),
                          (1, args.temp, 48, 48, 16), jnp.bfloat16) * 2.0

    jits = make_scan_decode(vae)

    import numpy as np
    for name, fn in {
        "loop_w2": lambda: chunk_decode(vae, params, z, window_size=2),
        "scan_w2": lambda: scan_chunk_decode(vae, params, z, jits=jits),
    }.items():
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
        if name == "loop_w2":
            ref = np.asarray(out[:, -1, ::7, ::11], np.float32)
            diff = 0.0
        else:
            diff = float(np.max(np.abs(
                np.asarray(out[:, -1, ::7, ::11], np.float32) - ref)))
        log(f"{name} {min(times):7.3f}s  (compile {compile_s:.1f}s, "
            f"shape {out.shape}, max diff vs loop {diff:.5f})")


if __name__ == "__main__":
    main()
