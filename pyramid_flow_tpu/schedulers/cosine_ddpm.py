"""Cosine DDPM scheduler (legacy slot; unused by the main pipeline).

Re-derivation of `diffusion_schedulers/scheduling_cosine_ddpm.py:27-137` as
pure functions: continuous-time cosine alpha-bar with scaler warping,
ancestral DDPM step, and forward noising. Kept for registry parity
(SURVEY.md §7.4) and for experiments with DDPM-style training.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .flow_matching import PyramidFlowMatchEulerDiscreteScheduler

__all__ = ["DDPMCosineScheduler", "SCHEDULER_REGISTRY", "get_scheduler"]


@dataclasses.dataclass(frozen=True)
class DDPMCosineScheduler:
    """Continuous cosine schedule; timesteps are t in [0, 1] (1 = pure noise)."""

    scaler: float = 1.0
    s: float = 0.008

    @property
    def _init_alpha_cumprod(self) -> float:
        return math.cos(self.s / (1 + self.s) * math.pi * 0.5) ** 2

    def alpha_cumprod(self, t: jnp.ndarray) -> jnp.ndarray:
        t = jnp.asarray(t, jnp.float32)
        if self.scaler > 1:
            t = 1 - (1 - t) ** self.scaler
        elif self.scaler < 1:
            t = t ** self.scaler
        ac = jnp.cos((t + self.s) / (1 + self.s) * jnp.pi * 0.5) ** 2
        return jnp.clip(ac / self._init_alpha_cumprod, 1e-4, 0.9999)

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        return np.linspace(1.0, 0.0, num_inference_steps + 1, dtype=np.float32)

    def add_noise(self, x, noise, t):
        ac = self.alpha_cumprod(t).reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.sqrt(ac) * x + jnp.sqrt(1 - ac) * noise

    def step(self, model_output, t, t_prev, sample, rng):
        """Ancestral step from t to t_prev (eps prediction)."""
        shape = (-1,) + (1,) * (sample.ndim - 1)
        ac = self.alpha_cumprod(t).reshape(shape)
        ac_prev = self.alpha_cumprod(t_prev).reshape(shape)
        alpha = ac / ac_prev
        mu = jax.lax.rsqrt(alpha) * (
            sample - (1 - alpha) * model_output * jax.lax.rsqrt(1 - ac))
        std = jnp.sqrt((1 - alpha) * (1 - ac_prev) / (1 - ac))
        noise = jax.random.normal(rng, sample.shape, sample.dtype)
        not_last = (jnp.asarray(t_prev).reshape(shape) != 0).astype(sample.dtype)
        return mu + std * noise * not_last


SCHEDULER_REGISTRY = {
    "pyramid_flow_match": PyramidFlowMatchEulerDiscreteScheduler,
    "ddpm_cosine": DDPMCosineScheduler,
}


def get_scheduler(name: str, **kwargs):
    if name not in SCHEDULER_REGISTRY:
        raise KeyError(
            f"unknown scheduler {name!r}; have {sorted(SCHEDULER_REGISTRY)}")
    return SCHEDULER_REGISTRY[name](**kwargs)
