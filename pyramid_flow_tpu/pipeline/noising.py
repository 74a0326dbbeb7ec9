"""Pyramid noising for training (spatial pyramid + AR temporal pyramid).

Re-derivation of the reference's training-noise construction
(`pyramid_dit/pyramid_dit_for_video_gen_pipeline.py:243-552`) in the
[B, T, H, W, C] layout. Both paths are pure functions of (latents, rng):

* :func:`noise_pyramid` — white noise downsampled bilinearly with the *2
  variance correction per level (:273-278).
* :func:`stage_endpoints` — per-stage (start, end) points of the rectified
  flow segment: start mixes noise with the nearest-2x-upsampled previous
  stage's clean latent (:307-314), end mixes noise with this stage's clean
  latent (:316-319). Velocity target = start - end (:347).
* :func:`add_pyramid_noise_stage` — full-sequence (non-AR) noising for one
  stage's sub-batch.
* :func:`add_ar_noise_stage` — AR noising: only the last ``frame_per_unit``
  frames are trainable; the conditioning prefix is [progressively lower-res
  clean history ..., corrupted last clip] with corruption
  sigma ~ U(0, corrupt_ratio) (:494-546). ``num_units`` is static per call
  (shape bucket); the trainer rotates through a bounded set of buckets.
* :func:`sample_stage_length` — the deterministic per-rank AR-position
  allocator (:351-373).

All return velocity-target training tuples ready for token packing.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.resample import avg_pool_2x, nearest_up_2x
from ..schedulers.flow_matching import PyramidFlowMatchEulerDiscreteScheduler

__all__ = [
    "StageBatch",
    "normalize_latent",
    "noise_pyramid",
    "latent_pyramid",
    "stage_endpoints",
    "add_pyramid_noise_stage",
    "add_ar_noise_stage",
    "sample_stage_length",
]


# latent normalization constants (reference pipeline :164-176) — the ONE
# definition; PyramidFlowPipeline reads these too so train-time (here) and
# inference-time normalization can never drift apart
LATENT_NORMS = {
    "pyramid_flux": (-0.04, 1 / 1.8726),
    "pyramid_mmdit": (0.1490, 1 / 1.8415),
}
VIDEO_NORM = (-0.2343, 1 / 3.0986)
_LATENT_NORMS = LATENT_NORMS  # back-compat alias
_VIDEO_NORM = VIDEO_NORM


def normalize_latent(x, model_name: str = "pyramid_flux"):
    """Raw VAE latent -> model space; frame 0 uses image stats (reference
    ``get_vae_latent`` :578-584). x: [B, T, H, W, C]."""
    shift, scale = _LATENT_NORMS[model_name]
    vshift, vscale = _VIDEO_NORM
    first = (x[:, :1] - shift) * scale
    if x.shape[1] == 1:
        return first
    rest = (x[:, 1:] - vshift) * vscale
    return jnp.concatenate([first, rest], axis=1)


class StageBatch(NamedTuple):
    """One stage's training inputs: clips (history..., noisy current),
    timesteps, and velocity targets for the trainable clip."""

    clips: List[jnp.ndarray]     # each [B, T_i, H_i, W_i, C]; last = noisy
    timesteps: jnp.ndarray       # [B]
    ratios: jnp.ndarray          # [B] (sigma within stage, 1 -> start)
    targets: jnp.ndarray         # [B, T_train, H, W, C] velocity


def _down2(x):
    """Bilinear 1/2 downsample over H, W of [B, T, H, W, C]."""
    return jnp.moveaxis(avg_pool_2x(jnp.moveaxis(x, -1, -3)), -3, -1)


def _up2_nearest(x):
    return jnp.moveaxis(nearest_up_2x(jnp.moveaxis(x, -1, -3)), -3, -1)


def noise_pyramid(rng, shape, num_stages: int, dtype=jnp.float32):
    """[lowest..full] noise pyramid with *2 variance correction per level."""
    noise = jax.random.normal(rng, shape, dtype)
    out = [noise]
    cur = noise
    for _ in range(num_stages - 1):
        cur = _down2(cur) * 2
        out.append(cur)
    return list(reversed(out))


def latent_pyramid(x, num_stages: int):
    """[lowest..full] clean-latent pyramid (bilinear, no scaling;
    reference ``get_pyramid_latent`` :554-570)."""
    out = [x]
    cur = x
    for _ in range(num_stages - 1):
        cur = _down2(cur)
        out.append(cur)
    return list(reversed(out))


def stage_endpoints(scheduler, stage: int, num_stages: int,
                    clean_latents: Sequence[jnp.ndarray],
                    noise_list: Sequence[jnp.ndarray]):
    """(start_point, end_point) of stage ``stage``'s flow segment."""
    start_sigma = scheduler.start_sigmas[stage]
    end_sigma = scheduler.end_sigmas[stage]
    clean = clean_latents[stage]
    noise = noise_list[stage]

    if stage == 0:
        start = noise
    else:
        up_prev = _up2_nearest(clean_latents[stage - 1])
        start = start_sigma * noise + (1 - start_sigma) * up_prev

    if stage == num_stages - 1:
        end = clean
    else:
        end = end_sigma * noise + (1 - end_sigma) * clean
    return start, end


def add_pyramid_noise_stage(
    rng,
    scheduler: PyramidFlowMatchEulerDiscreteScheduler,
    clean_latents: Sequence[jnp.ndarray],
    stage: int,
    num_stages: int,
) -> StageBatch:
    """Full-sequence noising for one stage sub-batch (reference :243-349)."""
    rng_noise, rng_t = jax.random.split(rng)
    noise_list = noise_pyramid(rng_noise, clean_latents[-1].shape, num_stages,
                               clean_latents[-1].dtype)
    start, end = stage_endpoints(scheduler, stage, num_stages, clean_latents,
                                 noise_list)
    b = start.shape[0]
    u = jax.random.uniform(rng_t, (b,))
    timesteps, ratios = scheduler.sample_stage_timesteps(u, stage)
    r = ratios.astype(start.dtype)[:, None, None, None, None]
    noisy = r * start + (1 - r) * end
    return StageBatch(
        clips=[noisy],
        timesteps=timesteps,
        ratios=ratios,
        targets=start - end,
    )


def add_ar_noise_stage(
    rng,
    scheduler: PyramidFlowMatchEulerDiscreteScheduler,
    clean_latents: Sequence[jnp.ndarray],
    stage: int,
    num_stages: int,
    num_units: int,
    frame_per_unit: int = 1,
    corrupt_ratio: float = 1.0 / 3,
) -> StageBatch:
    """AR temporal-pyramid noising for one stage sub-batch (:375-552).

    ``num_units`` is a static Python int (shape bucket). The returned clip
    list is ordered oldest -> newest, last clip = the trainable noisy unit.
    """
    rng_noise, rng_t, rng_sigma, rng_c = jax.random.split(rng, 4)
    t_full = clean_latents[-1].shape[1]
    max_units_avail = 1 + (t_full - 1) // frame_per_unit
    num_units = min(num_units, max_units_avail)
    actual_frames = 1 + (num_units - 1) * frame_per_unit

    noise_list = noise_pyramid(rng_noise, clean_latents[-1].shape, num_stages,
                               clean_latents[-1].dtype)
    start, end = stage_endpoints(scheduler, stage, num_stages, clean_latents,
                                 noise_list)

    b = start.shape[0]
    u = jax.random.uniform(rng_t, (b,))
    timesteps, ratios = scheduler.sample_stage_timesteps(u, stage)
    r = ratios.astype(start.dtype)[:, None, None, None, None]
    noisy = (r * start + (1 - r) * end)[:, :actual_frames]
    target = (start - end)[:, :actual_frames]

    # only the last unit trains
    noisy = noisy[:, -frame_per_unit:]
    target = target[:, -frame_per_unit:]

    clean = clean_latents[stage][:, :actual_frames]
    sigma_c = (
        jax.random.uniform(rng_sigma, (b,)) * corrupt_ratio
    ).astype(clean.dtype)[:, None, None, None, None]

    def corrupt(x, key):
        return sigma_c * jax.random.normal(key, x.shape, x.dtype) + (1 - sigma_c) * x

    if num_units == 1:
        return StageBatch([noisy], timesteps, ratios, target)

    keys = jax.random.split(rng_c, num_units)
    # newest-to-oldest construction, then reversed (reference :511-546)
    clips = [noisy]
    last_cond = clean[:, -(2 * frame_per_unit): -frame_per_unit]
    clips.append(corrupt(last_cond, keys[0]))

    cur_unit, cur_stage = 2, stage
    while cur_unit < num_units:
        cur_stage = max(cur_stage - 1, 0)
        if cur_stage == 0:
            break
        cur_unit += 1
        cond = clean_latents[cur_stage][:, :actual_frames]
        cond = cond[:, -(cur_unit * frame_per_unit): -((cur_unit - 1) * frame_per_unit)]
        clips.append(corrupt(cond, keys[cur_unit - 1]))

    if cur_stage == 0 and cur_unit < num_units:
        cond = clean_latents[0][:, :actual_frames]
        cond = cond[:, : -(cur_unit * frame_per_unit)]
        clips.append(corrupt(cond, keys[-1]))

    return StageBatch(list(reversed(clips)), timesteps, ratios, target)


def sample_stage_length(
    rank: int,
    step: int,
    num_stages: int = 3,
    max_temporal_length: int = 31,
    frame_per_unit: int = 1,
    video_sync_group: int = 8,
    max_units: Optional[int] = None,
) -> List[int]:
    """Deterministic per-rank AR-position allocation (reference :351-373).

    Ranks within a sync group cover different AR positions of the same video;
    ``step`` is the accumulated step counter driving the rotation.
    """
    max_units_in_training = 1 + (max_temporal_length - 1) // frame_per_unit
    # short-clip runs can have fewer AR units than the sync-group size (the
    # reference guards this only by a README constraint); one turn then
    # covers every position and the rotation is a no-op
    total_turns = max(1, max_units_in_training // video_sync_group)
    update_turn = step % total_turns

    high = max(int((rank % video_sync_group + 1) + update_turn * video_sync_group), 1)
    mid = max(1 + max_units_in_training - high, 1)
    low = mid
    if max_units is not None:
        high, mid, low = (min(x, max_units) for x in (high, mid, low))
    lengths = [low, mid, high]
    assert len(lengths) == num_stages
    return lengths
