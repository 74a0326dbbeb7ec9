"""Sharded DiT training step (GSPMD; replaces FSDP + Accelerate loops).

Re-expression of the reference training forward
(`pyramid_dit_for_video_gen_pipeline.py:639-674` + `trainer_misc/fsdp_trainer.py`)
as one jitted function over a (dp, fsdp, sp) mesh:

* text-drop CFG masking is applied by the data pipeline (rng-based here)
* the latent pyramid + per-stage noising runs on device inside the step
* each stage's sub-batch runs a separate DiT forward with its own static
  shapes (stage 0 tokens are 16x fewer than stage 2 — padding them to one
  buffer would waste ~60% of FLOPs; separate calls keep the MXU dense)
* loss = mean over all rows of per-row MSE (reference ``calculate_loss``)

``num_units_per_stage`` is static per call; the trainer rotates through the
bounded bucket set produced by ``sample_stage_length``.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..pipeline.noising import (
    StageBatch,
    add_ar_noise_stage,
    add_pyramid_noise_stage,
    latent_pyramid,
)
from ..pipeline.packing import pack_clips
from ..schedulers.flow_matching import PyramidFlowMatchEulerDiscreteScheduler
from .train_state import TrainState

__all__ = ["dit_loss_fn", "make_train_step", "stage_row_split",
           "top_grad_offenders"]


def stage_row_split(batch_size: int, sample_ratios: Sequence[int]):
    """Map batch rows to stages by ``sample_ratios`` (reference assigns batch
    columns :283-291; contiguous row blocks are equivalent and layout-friendly).
    Returns per-stage (start, count)."""
    total = sum(sample_ratios)
    assert batch_size % total == 0, (batch_size, sample_ratios)
    per = batch_size // total
    spans = []
    start = 0
    for r in sample_ratios:
        spans.append((start, per * r))
        start += per * r
    return spans


def dit_loss_fn(
    dit,
    params,
    rng,
    latents: jnp.ndarray,        # [B, T, H, W, C] clean, already normalized
    text_emb: jnp.ndarray,       # [B, Lt, joint]
    text_mask: jnp.ndarray,      # [B, Lt]
    pooled: jnp.ndarray,         # [B, pooled_dim]
    scheduler: PyramidFlowMatchEulerDiscreteScheduler,
    sample_ratios: Sequence[int] = (1, 2, 1),
    use_temporal_pyramid: bool = True,
    num_units_per_stage: Optional[Sequence[int]] = None,
    frame_per_unit: int = 1,
    corrupt_ratio: float = 1.0 / 3,
):
    """Forward + per-stage MSE. Returns (loss, metrics)."""
    num_stages = scheduler.stages
    pyramid = latent_pyramid(latents, num_stages)
    spans = stage_row_split(latents.shape[0], sample_ratios)

    losses = []
    for stage, (start, count) in enumerate(spans):
        rng, sub = jax.random.split(rng)
        stage_latents = [lvl[start: start + count] for lvl in pyramid]
        if use_temporal_pyramid:
            nu = num_units_per_stage[stage] if num_units_per_stage else 1
            sb: StageBatch = add_ar_noise_stage(
                sub, scheduler, stage_latents, stage, num_stages, nu,
                frame_per_unit, corrupt_ratio)
        else:
            sb = add_pyramid_noise_stage(
                sub, scheduler, stage_latents, stage, num_stages)

        tokens, positions, time_ids, trainable = pack_clips(sb.clips)
        b = tokens.shape[0]
        pos = jnp.broadcast_to(jnp.asarray(positions)[None], (b,) + positions.shape)
        times = jnp.broadcast_to(jnp.asarray(time_ids)[None], (b,) + time_ids.shape)

        extra = ()
        if hasattr(dit.config, "pos_embed_max_size"):
            # mmdit takes the SD3 sincos table crop origin for the stage's
            # grid (reference cropped_pos_embed; same math as the pipeline)
            h_s = stage_latents[stage].shape[2]
            w_s = stage_latents[stage].shape[3]
            g = dit.config.pos_embed_max_size
            off = jnp.asarray(
                [[(g - h_s // 2) // 2, (g - w_s // 2) // 2]], jnp.float32)
            extra = (jnp.broadcast_to(off, (b, 2)),)
        pred = dit.apply(
            params,
            tokens.astype(text_emb.dtype),
            pos,
            times,
            text_emb[start: start + count],
            text_mask[start: start + count],
            pooled[start: start + count],
            sb.timesteps,
            *extra,
        )
        pred = pred[:, -trainable:]
        target_tokens, _, _, _ = pack_clips([sb.targets])
        err = (pred.astype(jnp.float32) - target_tokens.astype(jnp.float32)) ** 2
        losses.append(err.reshape(count, -1).mean(axis=1))

    loss = jnp.concatenate(losses, axis=0).mean()
    return loss, {"train/loss": loss}


def make_train_step(
    dit,
    scheduler: PyramidFlowMatchEulerDiscreteScheduler,
    sample_ratios: Sequence[int] = (1, 2, 1),
    use_temporal_pyramid: bool = True,
    frame_per_unit: int = 1,
    corrupt_ratio: float = 1.0 / 3,
    cfg_rate: float = 0.1,
    donate: bool = True,
    vae=None,
    vae_params=None,
    model_name: str = "pyramid_flux",
    accum_steps: int = 1,
):
    """Build the jitted train step.

    step(state, batch, rng, num_units_per_stage) -> (state, metrics)
    batch: dict(latents | video, text_emb, text_mask, pooled, null_text_emb,
    null_pooled). ``num_units_per_stage`` is a static tuple (shape bucket).
    Pass ``vae``/``vae_params`` to train from raw pixels (the reference's
    ``load_vae`` online-encode path, pipeline :574-576): ``batch["video"]``
    [B, T, H, W, 3] is encoded+normalized inside the step.

    ``accum_steps > 1``: gradient accumulation inside the jitted step — the
    batch splits into micro-batches scanned sequentially with averaged grads
    (the reference's Accelerate grad-accum, `scripts/train_pyramid_flow.sh`
    uses 2). Batch size must divide by accum_steps * sum(sample_ratios).
    """
    from ..models.vae.model import gaussian_sample
    from ..pipeline.noising import normalize_latent

    def step_fn(state: TrainState, batch: Dict, rng,
                num_units_per_stage: Tuple[int, ...]):
        rng_drop, rng_noise, rng_vae = jax.random.split(
            jax.random.fold_in(rng, state.step), 3)

        if "video" in batch:
            assert vae is not None, "raw-pixel batch needs vae/vae_params"
            moments = jax.lax.stop_gradient(vae.apply(
                vae_params, batch["video"], method=vae.encode))
            z = gaussian_sample(moments, rng_vae)
            batch = dict(batch)
            batch["latents"] = normalize_latent(z, model_name)

        # 10% CFG text drop (reference get_text_embeddings :597-614)
        b = batch["latents"].shape[0]
        drop = jax.random.uniform(rng_drop, (b,)) <= cfg_rate
        text_emb = jnp.where(
            drop[:, None, None], batch["null_text_emb"], batch["text_emb"])
        text_mask = jnp.where(
            drop[:, None], batch.get("null_text_mask", batch["text_mask"]),
            batch["text_mask"])
        pooled = jnp.where(drop[:, None], batch["null_pooled"], batch["pooled"])

        def loss_fn(params, latents, t_emb, t_mask, pool, key):
            return dit_loss_fn(
                dit, params, key, latents, t_emb, t_mask,
                pool, scheduler, sample_ratios, use_temporal_pyramid,
                num_units_per_stage, frame_per_unit, corrupt_ratio)

        if accum_steps == 1:
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(
                state.params, batch["latents"], text_emb, text_mask, pooled,
                rng_noise)
        else:
            def split_mb(x):
                return x.reshape((accum_steps, x.shape[0] // accum_steps)
                                 + x.shape[1:])

            mbs = jax.tree.map(
                split_mb, (batch["latents"], text_emb, text_mask, pooled))
            keys = jax.random.split(rng_noise, accum_steps)

            def scan_body(carry, mb):
                grads_acc, loss_acc = carry
                lat, te, tm, po, key = mb
                (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, lat, te, tm, po, key)
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                return (grads_acc, loss_acc + l), None

            zero = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (grads, loss), _ = jax.lax.scan(
                scan_body, (zero, jnp.float32(0.0)), (*mbs, keys))
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            loss = loss / accum_steps
            metrics = {"train/loss": loss}
        gnorm = optax_global_norm(grads)
        state = state.apply_gradients(grads, loss)
        metrics = dict(metrics)
        metrics["train/grad_norm"] = gnorm
        return state, metrics

    return jax.jit(
        step_fn,
        static_argnames=("num_units_per_stage",),
        donate_argnames=("state",) if donate else (),
    )


def optax_global_norm(tree):
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))


def top_grad_offenders(grads, k: int = 5):
    """Per-parameter grad norms, largest first (reference ``get_grad_norm_``
    top-5 offender printout, `trainer_misc/utils.py:475-498`). Host-side
    debugging aid — call on materialized grads outside the jitted step."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    norms = [
        ("/".join(str(p) for p in path),
         float(jnp.linalg.norm(leaf.astype(jnp.float32))))
        for path, leaf in flat
    ]
    return sorted(norms, key=lambda kv: -kv[1])[:k]
