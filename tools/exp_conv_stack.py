"""Experiment: kt=3 causal conv as ONE stacked-channel 2D conv.

The decoder's kt=3 stride-1 convs run as either XLA conv3d (512 ch) or 3
per-tap 2D convs summed (<=256 ch since round 4, `models/vae/layers.py`;
the gate was <=128 when this experiment was first written).
Hypothesis: stacking the 3 temporal taps along the channel axis and running
ONE 2D conv with C_in' = 3*C_in raises MXU arithmetic intensity per output
tile (one weight load + one output write instead of three of each), so it
should beat both at the wide-channel levels where the per-tap form measured
neutral (DESIGN.md known-gaps).

Shapes = the real per-(tile, window) decode shapes of the 768p bench
(save_memory=True -> 384px tiles, window=2 latent frames):
  up3 (full res): [1, 16, 384, 384] x 128ch   (~40% of decode FLOP-time)
  up2:            [1,  8, 192, 192] x 256ch   (~30%)
  up1:            [1,  4,  96,  96] x 512ch   (~30% with up0+mid)

Usage: python tools/exp_conv_stack.py [--iters N]
Prints TF/s per (shape, variant) and a verdict line per shape.
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
    float(jnp.sum(out.astype(jnp.float32)))


def timeit(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.time() - t0) / iters


def conv3d(x, k):
    """XLA 3D conv, the current >=256ch path (front pad already applied)."""
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def tap_summed(x, k):
    """3 per-tap 2D convs summed — the current <=128ch path."""
    b = x.shape[0]
    t_out = x.shape[1] - 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for tap in range(3):
        xt = xp[:, tap: tap + t_out].reshape((b * t_out,) + xp.shape[2:])
        o = jax.lax.conv_general_dilated(
            xt, k[tap], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = o if out is None else out + o
    return out.reshape((b, t_out) + out.shape[1:])


def stacked(x, k):
    """ONE 2D conv over the 3 taps stacked along channels (tap-major)."""
    b = x.shape[0]
    t_out = x.shape[1] - 2
    # xs[t, ..., tap*C + c] = x[t + tap, ..., c]
    xs = jnp.concatenate([x[:, 0:t_out], x[:, 1:t_out + 1],
                          x[:, 2:t_out + 2]], axis=-1)
    xs = xs.reshape((b * t_out,) + xs.shape[2:])
    # kernel [kt,kh,kw,ci,co] -> [kh,kw,kt*ci,co], tap-major over ci
    kk = jnp.transpose(k, (1, 2, 0, 3, 4)).reshape(
        k.shape[1], k.shape[2], 3 * k.shape[3], k.shape[4])
    o = jax.lax.conv_general_dilated(
        xs, kk, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return o.reshape((b, t_out) + o.shape[1:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    shapes = [  # (t_out, H, W, C) at the 768p bench decode tiles
        ("up3_128ch", 16, 384, 384, 128),
        ("up2_256ch", 8, 192, 192, 256),
        ("up1_512ch", 4, 96, 96, 512),
        ("up0_512ch", 2, 48, 48, 512),
    ]
    variants = {"conv3d": conv3d, "tap_summed": tap_summed, "stacked": stacked}

    for name, t_out, h, w, c in shapes:
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (1, t_out + 2, h, w, c), jnp.bfloat16)
        k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, c, c),
                               jnp.bfloat16) * 0.05)
        flops = 2 * 27 * c * c * t_out * h * w
        # correctness first
        ref = np.asarray(conv3d(x, k), np.float32)
        results = {}
        for vname, fn in variants.items():
            jf = jax.jit(fn)
            got = np.asarray(jf(x, k), np.float32)
            err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-6)
            assert err < 2e-2, (name, vname, err)
            dt = timeit(jf, x, k, iters=args.iters)
            results[vname] = dt
            log(f"{name:12s} {vname:10s} {dt*1e3:8.2f} ms  "
                f"{flops/dt/1e12:6.1f} TF/s  (rel err {err:.4f})")
        best = min(results, key=results.get)
        # 'current' mirrors the production gate in models/vae/layers.py
        # (tap decomposition at <=256 ch) so re-runs report a true baseline
        cur = "tap_summed" if c <= 256 else "conv3d"
        log(f"{name:12s} VERDICT: best={best} "
            f"({results[cur]/results[best]:.3f}x vs current '{cur}')")


if __name__ == "__main__":
    main()
