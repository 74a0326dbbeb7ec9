"""Pyramidal flow-matching Euler scheduler (TPU-native, JAX).

Re-derivation of the reference scheduler
(`/root/reference/diffusion_schedulers/scheduling_flow_matching.py:27-297`) as a
set of *precomputed static tables* + a pure functional Euler step, so the whole
denoise loop can live inside a single ``jax.jit`` with no host round-trips.

Semantics (all verified against the reference formulas):

* A global shifted-sigma schedule ``sigma' = shift*sigma / (1 + (shift-1)*sigma)``
  over ``num_train_timesteps`` points (reference ``init_sigmas``, :70-88).
* The unit interval is partitioned into ``stages`` windows by ``stage_range``.
  For stage ``s>0`` the window start sigma is corrected for the
  upsample-and-renoise transition (reference :112-117):
      ori = 1 - start_sigma
      corrected = ori / (sqrt(1 + 1/gamma) * (1 - ori) + ori)
      start_sigma <- 1 - corrected
* Per-stage timestep tables are linspaces of length ``num_train_timesteps``
  inside the stage window (reference :137-149); per-stage unit-interval sigma
  ("ratio") tables are ``linspace(1, 0, N+1)[:-1]``.
* ``set_timesteps(n, stage)`` linspaces ``n`` points between the stage's
  first/last table entries (reference :179-206).
* The Euler step is ``prev = x + (sigma_{i+1} - sigma_i) * v`` in float32
  (reference :274-289).

Design difference from the reference: no mutable ``_step_index`` state — the
step takes explicit ``(sigma, sigma_next)`` scalars (or a step index into a
precomputed per-stage table), making it trivially usable inside
``jax.lax.fori_loop`` / ``scan``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "PyramidFlowMatchEulerDiscreteScheduler",
    "euler_step",
]


def _shifted_sigmas(num_train_timesteps: int, shift: float) -> np.ndarray:
    """Global sigma table, descending from ~1 to 1/N, with SD3-style shift."""
    timesteps = np.linspace(
        1, num_train_timesteps, num_train_timesteps, dtype=np.float32
    )[::-1].copy()
    sigmas = timesteps / num_train_timesteps
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    return sigmas.astype(np.float32)


@dataclass(frozen=True)
class PyramidFlowMatchEulerDiscreteScheduler:
    """Static scheduler tables; all methods are pure.

    Attributes mirror the reference config:
      num_train_timesteps=1000, shift, stages, stage_range, gamma.
    """

    num_train_timesteps: int = 1000
    shift: float = 1.0
    stages: int = 3
    stage_range: Tuple[float, ...] = (0.0, 1.0 / 3, 2.0 / 3, 1.0)
    gamma: float = 1.0 / 3

    # Derived (filled in __post_init__ via object.__setattr__)
    sigmas: np.ndarray = field(init=False, repr=False)
    timesteps: np.ndarray = field(init=False, repr=False)
    start_sigmas: Tuple[float, ...] = field(init=False)
    end_sigmas: Tuple[float, ...] = field(init=False)
    ori_start_sigmas: Tuple[float, ...] = field(init=False)
    timestep_ratios: Tuple[Tuple[float, float], ...] = field(init=False)
    timesteps_per_stage: Tuple[np.ndarray, ...] = field(init=False, repr=False)
    sigmas_per_stage: Tuple[np.ndarray, ...] = field(init=False, repr=False)

    def __post_init__(self):
        n = self.num_train_timesteps
        sigmas = _shifted_sigmas(n, self.shift)
        timesteps = sigmas * n

        start_sigmas: List[float] = []
        end_sigmas: List[float] = []
        ori_start_sigmas: List[float] = []
        stage_distance: List[float] = []

        for i_s in range(self.stages):
            start_idx = max(int(self.stage_range[i_s] * n), 0)
            end_idx = min(int(self.stage_range[i_s + 1] * n), n)
            start_sigma = float(sigmas[start_idx])
            end_sigma = float(sigmas[end_idx]) if end_idx < n else 0.0
            ori_start_sigmas.append(start_sigma)

            if i_s != 0:
                ori = 1 - start_sigma
                corrected = (
                    1.0 / (math.sqrt(1 + 1 / self.gamma) * (1 - ori) + ori)
                ) * ori
                start_sigma = 1 - corrected

            stage_distance.append(start_sigma - end_sigma)
            start_sigmas.append(start_sigma)
            end_sigmas.append(end_sigma)

        tot = sum(stage_distance)
        ratios: List[Tuple[float, float]] = []
        for i_s in range(self.stages):
            start_ratio = 0.0 if i_s == 0 else sum(stage_distance[:i_s]) / tot
            end_ratio = (
                1.0 if i_s == self.stages - 1 else sum(stage_distance[: i_s + 1]) / tot
            )
            ratios.append((start_ratio, end_ratio))

        ts_per_stage: List[np.ndarray] = []
        sig_per_stage: List[np.ndarray] = []
        for i_s in range(self.stages):
            r0, r1 = ratios[i_s]
            t_max = float(timesteps[int(r0 * n)])
            t_min = float(timesteps[min(int(r1 * n), n - 1)])
            ts = np.linspace(t_max, t_min, n + 1)[:-1]
            ts_per_stage.append(ts.astype(np.float32))
            sig_per_stage.append(np.linspace(1.0, 0.0, n + 1)[:-1].astype(np.float32))

        object.__setattr__(self, "sigmas", sigmas)
        object.__setattr__(self, "timesteps", timesteps.astype(np.float32))
        object.__setattr__(self, "start_sigmas", tuple(start_sigmas))
        object.__setattr__(self, "end_sigmas", tuple(end_sigmas))
        object.__setattr__(self, "ori_start_sigmas", tuple(ori_start_sigmas))
        object.__setattr__(self, "timestep_ratios", tuple(ratios))
        object.__setattr__(self, "timesteps_per_stage", tuple(ts_per_stage))
        object.__setattr__(self, "sigmas_per_stage", tuple(sig_per_stage))

    @property
    def sigma_min(self) -> float:
        return float(self.sigmas[-1])

    @property
    def sigma_max(self) -> float:
        return float(self.sigmas[0])

    # ----------------------------------------------------------- inference
    def inference_tables(
        self, num_inference_steps: int, stage_index: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Return ``(timesteps[n], sigmas[n+1])`` for a stage's denoise loop.

        Matches the reference ``set_timesteps`` (:179-206): timesteps linspace
        between the stage table's first/last entries; sigmas linspace 1..0 over
        ``n`` points with an appended terminal 0.
        """
        stage_ts = self.timesteps_per_stage[stage_index]
        timesteps = np.linspace(
            float(stage_ts[0]), float(stage_ts[-1]), num_inference_steps
        ).astype(np.float32)

        stage_sig = self.sigmas_per_stage[stage_index]
        sigmas = np.linspace(
            float(stage_sig[0]), float(stage_sig[-1]), num_inference_steps
        ).astype(np.float32)
        sigmas = np.concatenate([sigmas, np.zeros((1,), dtype=np.float32)])
        return timesteps, sigmas

    # ------------------------------------------------------------ training
    def sample_stage_timesteps(
        self, u: np.ndarray | jnp.ndarray, stage_index: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Map uniform samples ``u in [0,1)`` to (timestep, ratio) for a stage.

        Reference: pipeline :322-333 — ``idx = clamp(floor(u*N), 0, N-1)``,
        then index the per-stage tables.
        """
        n = self.num_train_timesteps
        idx = jnp.clip((u * n).astype(jnp.int32), 0, n - 1)
        ts = jnp.asarray(self.timesteps_per_stage[stage_index])[idx]
        ratios = jnp.asarray(self.sigmas_per_stage[stage_index])[idx]
        return ts, ratios

    # Renoise coefficients for the stage transition (upsample-and-renoise).
    def transition_coefficients(self, stage_index: int) -> Tuple[float, float]:
        """``(alpha, beta)`` for ``x <- alpha*up(x) + beta*block_noise``.

        Reference: pipeline :735-738.
        """
        assert stage_index > 0
        ori_sigma = 1 - self.ori_start_sigmas[stage_index]
        gamma = self.gamma
        alpha = 1 / (math.sqrt(1 + (1 / gamma)) * (1 - ori_sigma) + ori_sigma)
        beta = alpha * (1 - ori_sigma) / math.sqrt(gamma)
        return alpha, beta


def euler_step(sample: jnp.ndarray, velocity: jnp.ndarray, sigma: jnp.ndarray,
               sigma_next: jnp.ndarray) -> jnp.ndarray:
    """One rectified-flow Euler step in float32 (reference :274-289)."""
    out = sample.astype(jnp.float32) + (sigma_next - sigma) * velocity.astype(
        jnp.float32
    )
    # keep the CARRY dtype: a bf16 model output must not demote an fp32
    # latent (lax loop carries would reject the dtype flip)
    return out.astype(sample.dtype)
