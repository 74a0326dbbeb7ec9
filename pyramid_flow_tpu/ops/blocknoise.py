"""Correlated 2x2-block noise for pyramid stage transitions.

Reference ``sample_block_noise`` (`pyramid_dit_for_video_gen_pipeline.py:697-703`):
each 2x2 spatial block draws from MVN(0, (1+g)I - g*11^T) so that after the
nearest-2x upsample-renoise the per-pixel variance is corrected while the
block mean stays consistent. The reference samples via
``torch.distributions.MultivariateNormal`` one block at a time on the host;
here we precompute the Cholesky factor (numpy, static) and do one fused
matmul over standard normals — fully on-device, jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sample_block_noise"]


def _chol(gamma: float) -> np.ndarray:
    cov = (1 + gamma) * np.eye(4) - gamma * np.ones((4, 4))
    return np.linalg.cholesky(cov).astype(np.float32)


def sample_block_noise(rng, shape, gamma: float = 1.0 / 3, dtype=jnp.float32):
    """Sample [B, T, H, W, C] noise with 2x2-block covariance structure.

    H, W must be even. Matches the reference distribution exactly: block
    vector = L @ z, z ~ N(0, I_4), laid out as (p, q) within each block.
    """
    b, t, h, w, c = shape
    L = jnp.asarray(_chol(gamma))
    z = jax.random.normal(rng, (b, t, h // 2, w // 2, c, 4), jnp.float32)
    v = jnp.einsum("...i,ji->...j", z, L)  # [.., 4] correlated
    v = v.reshape(b, t, h // 2, w // 2, c, 2, 2)
    v = v.transpose(0, 1, 2, 5, 3, 6, 4)  # b t h' p w' q c
    return v.reshape(b, t, h, w, c).astype(dtype)
