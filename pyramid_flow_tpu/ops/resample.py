"""Spatial resampling ops with exact torch ``F.interpolate`` semantics.

The pyramid construction depends on three resamplers (reference
`pyramid_dit/pyramid_dit_for_video_gen_pipeline.py`):

* bilinear 1/2 downsample (``mode='bilinear'``, align_corners=False) — used to
  build latent/noise pyramids (:276, :565). For an exact 2x reduction this is
  mathematically a 2x2 average pool, which XLA lowers to a single fused
  reduce-window — far cheaper than a gather-based general resize.
* nearest 2x upsample (:312, :732) — a pure repeat (broadcast + reshape).
* 1-D linear interpolation of integer position grids (flux
  ``_prepare_image_ids``, `modeling_pyramid_flux.py:194-204`).

All functions operate channels-last on the trailing two spatial dims unless
noted; callers handle layout. Inputs may be any float dtype; math follows the
input dtype (reference computes in model dtype too).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "avg_pool_2x",
    "nearest_up_2x",
    "resize_bilinear",
    "interp_linear_1d_grid",
    "downsample_pyramid",
]


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-2x bilinear downsample == 2x2 mean pool over trailing (H, W).

    x: [..., H, W] with H, W even.
    """
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2)
    return x.mean(axis=(-3, -1))


def nearest_up_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample over trailing (H, W): each pixel -> 2x2 block."""
    *lead, h, w = x.shape
    x = jnp.broadcast_to(x[..., :, None, :, None], (*lead, h, 2, w, 2))
    return x.reshape(*lead, h * 2, w * 2)


def _linear_weights(in_size: int, out_size: int):
    """Source indices/weights for 1-D linear resize, align_corners=False."""
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """General bilinear resize over trailing (H, W), align_corners=False.

    Matches torch ``F.interpolate(mode='bilinear')``. Used for non-2x cases;
    exact 2x down goes through :func:`avg_pool_2x`.
    """
    *lead, h, w = x.shape
    if out_h == h and out_w == w:
        return x
    if out_h * 2 == h and out_w * 2 == w:
        return avg_pool_2x(x)

    lo_h, hi_h, fh = _linear_weights(h, out_h)
    lo_w, hi_w, fw = _linear_weights(w, out_w)
    fh = jnp.asarray(fh, x.dtype)[..., :, None]
    fw = jnp.asarray(fw, x.dtype)[None, :]

    top = x[..., lo_h, :]
    bot = x[..., hi_h, :]
    row = top * (1 - fh) + bot * fh  # [..., out_h, W]
    left = row[..., :, lo_w]
    right = row[..., :, hi_w]
    return left * (1 - fw) + right * fw


def interp_linear_1d_grid(in_size: int, out_size: int) -> np.ndarray:
    """Linearly resample ``arange(in_size)`` to ``out_size`` points.

    Replicates flux's interpolated RoPE positions
    (`modeling_pyramid_flux.py:194,202`): low-res stages share the full-res
    coordinate frame. Pure numpy — positions are static per shape bucket.
    """
    if in_size == out_size:
        return np.arange(in_size, dtype=np.float32)
    lo, hi, frac = _linear_weights(in_size, out_size)
    grid = np.arange(in_size, dtype=np.float32)
    return (grid[lo] * (1 - frac) + grid[hi] * frac).astype(np.float32)


def downsample_pyramid(x: jnp.ndarray, num_levels: int, noise_scale: bool = False):
    """Build ``[lowest, ..., x]`` pyramid by repeated 2x bilinear downsample.

    x: [B, T, H, W, C] (time-major, channels-last — the TPU-native layout).
    ``noise_scale=True`` multiplies by 2 per level (variance correction for
    downsampled white noise, reference :276).
    Returns list ordered low-res first (reference ``get_pyramid_latent`` :554).
    """
    out = [x]
    cur = x
    for _ in range(num_levels):
        cur = jnp.moveaxis(avg_pool_2x(jnp.moveaxis(cur, -1, -3)), -3, -1)
        if noise_scale:
            cur = cur * 2
        out.append(cur)
    return list(reversed(out))
