"""Multi-axis rotary embeddings (FLUX convention) for packed sequences.

Re-derivation of the reference ``rope``/``EmbedND``/``apply_rope``
(`pyramid_dit/flux_modules/modeling_pyramid_flux.py:28-57`,
`modeling_flux_block.py:34-39`): per-axis interleaved-pair rotations with
axis dims ``[16, 24, 24]`` over (t, h, w) positions; positions may be
fractional (low-res stages linearly interpolate the full-res grid). Text
tokens use position 0 on every axis — an identity rotation.

Instead of the reference's [..., d/2, 2, 2] rotation-matrix tensor we carry
``(cos, sin)`` arrays of shape [B, L, D/2]; the rotation is two fused
multiplies on the VPU.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["rope_freqs", "apply_rope"]


def rope_freqs(
    positions: jnp.ndarray,
    axes_dim: Sequence[int] = (16, 24, 24),
    theta: float = 10000.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (cos, sin) for multi-axis RoPE.

    positions: [B, L, n_axes] float32 (fractional allowed).
    Returns cos, sin: [B, L, sum(axes_dim)//2] float32, ordered axis-major
    (t pairs, then h pairs, then w pairs) to match the reference's concat
    along the pair dimension (`modeling_pyramid_flux.py:52-56`).
    """
    outs_cos, outs_sin = [], []
    for i, dim in enumerate(axes_dim):
        scale = np.arange(0, dim, 2, dtype=np.float64) / dim
        omega = jnp.asarray(1.0 / (theta ** scale), jnp.float32)
        ang = positions[..., i].astype(jnp.float32)[..., None] * omega
        outs_cos.append(jnp.cos(ang))
        outs_sin.append(jnp.sin(ang))
    return jnp.concatenate(outs_cos, axis=-1), jnp.concatenate(outs_sin, axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs of the head dim.

    x: [B, H, L, D]; cos/sin: [B, L, D/2].
    out_even = cos*x_even - sin*x_odd; out_odd = sin*x_even + cos*x_odd
    (reference `apply_rope`, fp32 math, cast back to input dtype).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_even = xf[..., 0::2]
    x_odd = xf[..., 1::2]
    c = cos[:, None, :, :]
    s = sin[:, None, :, :]
    out_even = c * x_even - s * x_odd
    out_odd = s * x_even + c * x_odd
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(dtype)
