"""PyramidFlow generation pipeline — TPU-native runner.

Re-design of ``PyramidDiTForVideoGeneration``
(`pyramid_dit/pyramid_dit_for_video_gen_pipeline.py:114-1279`). The reference
drives a Python denoise loop with per-step host sync; here each (stage,
history-shape) denoise loop is ONE jitted ``lax.fori_loop`` with donated
latent buffers — zero host round-trips inside a stage, and the jit cache
reuses compilations across units with identical shapes.

Text encoding is decoupled: ``generate``/``generate_i2v`` take precomputed
(prompt_embeds, prompt_attention_mask, pooled) pairs for positive and
negative prompts (use ``pyramid_flow_tpu.models.text`` to produce them).
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.blocknoise import sample_block_noise
from ..ops.resample import avg_pool_2x, nearest_up_2x
from ..schedulers.flow_matching import PyramidFlowMatchEulerDiscreteScheduler
from .noising import latent_pyramid
from .packing import clip_metadata, pack_clips, patchify, unpatchify

__all__ = ["PyramidFlowPipeline"]


def _down2(x):
    return jnp.moveaxis(avg_pool_2x(jnp.moveaxis(x, -1, -3)), -3, -1)


def _up2_nearest(x):
    return jnp.moveaxis(nearest_up_2x(jnp.moveaxis(x, -1, -3)), -3, -1)


def _device_hbm_gb() -> float:
    """Per-chip HBM capacity in GB (``memory_stats`` when the backend
    exposes it; 16 GB v5e assumed otherwise — the conservative floor)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit:
            return limit / 1e9
    except Exception:
        pass
    return 16.0


def decode_settings(save_memory: bool, hbm_gb: float,
                    dit_resident: bool = True) -> dict:
    """Pick VAE-decode tiling from the chip's HBM capacity (VERDICT r2 #9).

    The measured v5e-16GB sweet spots are the floor; a big-HBM chip (v5p
    95 GB — the BASELINE hardware) skips the memory dodges entirely:

    * 16 GB + save_memory + DiT resident: 384px tiles / 1-8 overlap /
      window 2 — measured optimum that coexists with the resident 5.8 GB
      DiT (512px tiles + w2 decode 7% faster VAE-alone but OOM with the
      DiT resident; window 1, the reference's dodge at :1232-1236, costs
      4% for nothing). Untiled whole-frame windows are ~7x a 384px tile,
      so untiled falls back to window 1, and frames beyond a 96x96 latent
      (768x768 px) must tile.
    * 16 GB + DiT released (``generate(release_dit_before_decode=True)``
      dropped the transformer the way the reference moves it to host RAM
      before decoding, `pyramid_dit_for_video_gen_pipeline.py:1208-1216`):
      a ``px_window_budget`` (latent px x window frames per program,
      measured OOM wall on v5e) buys the least-redundant plan that fits —
      full-height window-1 column strips at 768p (1.09x redundancy vs the
      1.25x reference walk), untiled window-2 at 384p.
    * >=48 GB: 512px tiles, window 2 everywhere, and whole frames up to a
      192x192 latent (1536px) decode untiled — the overlap recompute and
      per-tile dispatch chain disappear at the sizes that OOM a v5e.

    Pure function of its arguments for unit-testing with mocked capacities.
    """
    big = hbm_gb >= 48.0
    if not save_memory:
        return {"tile": 512, "overlap": 0.25, "window": 2,
                "untiled_window": 2,
                "untiled_max_latent": 192 if big else 96}
    if big:
        return {"tile": 512, "overlap": 0.125, "window": 2,
                "untiled_window": 2, "untiled_max_latent": 192}
    if not dit_resident:
        # measured on v5e (tools/exp_vae_tiling.py + isolated-process strip
        # probes): 96x48 latent @ window 2 (9216 px-windows) decodes,
        # 96x58 @ w2 (11136) OOMs. Window-1 halves the budget need but
        # costs ~14% per px (measured 9.85 s vs 8.65 s expected at w58), so
        # the planner prefers w2 at every rung.
        return {"px_window_budget": 9216,
                # fallback walk for extreme shapes the planner can't fit
                "tile": 384, "overlap": 0.125, "window": 2,
                "untiled_window": 1, "untiled_max_latent": 96}
    # v5e 16 GB floor: the reference tiles at 256px with 1/4 overlap under
    # save_memory because its DiT is offloaded to host RAM on consumer GPUs;
    # on TPU the DiT stays resident — 384px tiles with 1/8 overlap are the
    # sweet spot that coexists with it (at 768p: 1.2x redundancy vs 1.87x
    # for the reference settings; the 48px blend band still hides seams).
    return {"tile": 384, "overlap": 0.125, "window": 2,
            "untiled_window": 1, "untiled_max_latent": 96}


class PyramidFlowPipeline:
    """Inference runner: AR unit loop -> per-stage jitted denoise cascades ->
    causal VAE decode.

    Args:
      dit: a ``PyramidFluxTransformer``-like flax module (packed-token API).
      dit_params: its variables.
      vae, vae_params: ``CausalVideoVAE`` and variables (optional: latent out).
      model_name: 'pyramid_flux' | 'pyramid_mmdit' (selects latent norms,
        reference :164-176).
    """

    def __init__(
        self,
        dit,
        dit_params,
        vae=None,
        vae_params=None,
        scheduler: Optional[PyramidFlowMatchEulerDiscreteScheduler] = None,
        model_name: str = "pyramid_flux",
        stages: Sequence[int] = (1, 2, 4),
        frame_per_unit: int = 1,
        latent_channels: int = 16,
        timestep_shift: float = 1.0,
        stage_range: Sequence[float] = (0, 1 / 3, 2 / 3, 1),
        scheduler_gamma: float = 1 / 3,
        pos_embed_max_size: int = 192,
        dtype=jnp.bfloat16,
    ):
        self.dit = dit
        self.dit_params = dit_params
        self.vae = vae
        self.vae_params = vae_params
        self.model_name = model_name
        self.stages = list(stages)
        self.num_stages = len(self.stages)
        self.frame_per_unit = frame_per_unit
        self.latent_channels = latent_channels
        self.downsample = 8
        self.dtype = dtype
        self.scheduler = scheduler or PyramidFlowMatchEulerDiscreteScheduler(
            shift=timestep_shift,
            stages=self.num_stages,
            stage_range=tuple(stage_range),
            gamma=scheduler_gamma,
        )

        # latent normalization constants (reference :164-176)
        from .noising import LATENT_NORMS, VIDEO_NORM

        if model_name not in LATENT_NORMS:
            raise ValueError(f"unknown model_name {model_name}")
        self.vae_shift_factor, self.vae_scale_factor = LATENT_NORMS[model_name]
        self.vae_video_shift_factor, self.vae_video_scale_factor = VIDEO_NORM
        # SD3 sincos table size (mmdit only). Must match the DiT config's
        # table, or the pipeline's crop origin indexes a different grid than
        # the model built — from_pretrained forwards the checkpoint's value.
        self.pos_embed_max_size = pos_embed_max_size
        self.MAX_STEPS = 64  # timestep-buffer size (dynamic trip count)

        self._denoise_jit = jax.jit(
            self._denoise_stage_loop,
            static_argnames=("upsample", "trainable_tokens", "temp", "height",
                             "width"),
            donate_argnames=("latents",),
        )
        self._prep_cond_jit = jax.jit(
            self._prep_cond_from_history,
            static_argnames=("unit_index", "stage", "budget"))

    @classmethod
    def from_pretrained(cls, model_path: str,
                        model_variant: str = "diffusion_transformer_768p",
                        model_name: str = "pyramid_flux",
                        load_vae: bool = True,
                        dtype=jnp.bfloat16,
                        mesh=None,
                        **kwargs):
        """Build a pipeline from a released checkpoint dir (HF snapshot
        layout; mirrors the reference ctor's component loading :138-159).
        Text encoding stays separate — see ``models.text.encoder``."""
        import os

        from ..models.flux.model import PyramidFluxTransformer
        from ..models.mmdit.model import PyramidDiffusionMMDiT
        from ..models.vae.model import CausalVideoVAE
        from ..utils.checkpoint import (
            load_model_config, load_pretrained_components)

        # API parity: the reference's GPU-memory staging knob (ctor :201-211)
        # is meaningless on TPU (HBM holds the full pipeline); accept and
        # ignore it so callers can switch without edits.
        kwargs.pop("cpu_offloading", None)

        comps = load_pretrained_components(
            model_path, model_variant, model_name, load_vae=load_vae)
        dit_dir = os.path.join(model_path, model_variant)
        if model_name == "pyramid_flux":
            dit = PyramidFluxTransformer(
                config=load_model_config(dit_dir, "flux"), dtype=dtype,
                mesh=mesh)
        else:
            mmdit_cfg = load_model_config(dit_dir, "mmdit")
            dit = PyramidDiffusionMMDiT(config=mmdit_cfg, dtype=dtype,
                                        mesh=mesh)
            kwargs.setdefault("pos_embed_max_size",
                              mmdit_cfg.pos_embed_max_size)
        vae = None
        if load_vae:
            vae_cfg = load_model_config(
                os.path.join(model_path, "causal_video_vae"), "vae")
            vae = CausalVideoVAE(config=vae_cfg, dtype=dtype)
            # the latent width is a property of the checkpoint, not a knob
            kwargs.setdefault("latent_channels", vae_cfg.latent_channels)
        return cls(dit, comps["dit"], vae, comps.get("vae"),
                   model_name=model_name, dtype=dtype, **kwargs)

    @classmethod
    def from_train_state(cls, dit, train_state, vae=None, vae_params=None,
                         use_ema: bool = False, **kwargs):
        """Build an inference pipeline from a live/restored ``TrainState``.

        ``use_ema=True`` generates with the EMA weights — the reference
        trains with an EMA copy and ships it for inference
        (`train/train_pyramid_flow.py:451-486`). EMA params are kept fp32;
        compute dtype is governed by the module, so no cast is needed."""
        params = train_state.ema_params if use_ema else train_state.params
        return cls(dit, params, vae, vae_params, **kwargs)

    def enable_sequential_cpu_offload(self):
        """API-parity no-op (reference :201-211). The reference offloads
        modules to host RAM to fit consumer GPUs (<8 GB); TPU HBM (16-95 GB)
        holds the full pipeline resident, and XLA already stages HBM<->host
        transfers for arrays that exceed device memory."""
        return self

    # ------------------------------------------------------------ helpers
    def normalize_latent(self, x):
        """pixels-encoded latent -> model space; frame 0 uses image stats
        (reference ``get_vae_latent`` :578-584)."""
        first = (x[:, :1] - self.vae_shift_factor) * self.vae_scale_factor
        if x.shape[1] == 1:
            return first
        rest = (x[:, 1:] - self.vae_video_shift_factor) * self.vae_video_scale_factor
        return jnp.concatenate([first, rest], axis=1)

    def denormalize_latent(self, x):
        """model space -> VAE latent space (reference ``decode_latent`` :1226-1230)."""
        first = x[:, :1] / self.vae_scale_factor + self.vae_shift_factor
        if x.shape[1] == 1:
            return first
        rest = x[:, 1:] / self.vae_video_scale_factor + self.vae_video_shift_factor
        return jnp.concatenate([first, rest], axis=1)

    def _pack_cond(self, clips, *, budget: int):
        """Patchify+concat conditioning clips, RIGHT-pad to ``budget`` tokens,
        CFG-double — one compiled program per history shape bucket.

        Pad sits BETWEEN cond and the current clip (not in front): a front
        pad poisons the first k-tiles of every row (mixed INVALID+valid ->
        MASKED branch) *and* the q-tiles it lands in. Measured tile-type
        histogram over all 48 (unit, stage) 768p layouts: front pad = 757
        MASKED / 399 FULL / 251 SKIP, this layout = 498 / 531 / 378 —
        ~15%% less effective tile compute."""
        tokens = jnp.concatenate(
            [patchify(c.astype(self.dtype)) for c in clips], axis=1)
        pad = budget - tokens.shape[1]
        if pad:
            tokens = jnp.pad(tokens, ((0, 0), (0, pad), (0, 0)))
        return jnp.concatenate([tokens, tokens], axis=0)

    # ----------------------------------------------------- denoise (jitted)
    def _denoise_stage_loop(
        self,
        params,
        latents,            # [B, T, h, w, C]
        cond_tokens,        # [2B, Lc, Cp] (CFG-doubled) or [2B, 0, Cp]
        positions,          # [1, Lc+Ll, 3] float32
        time_ids,           # [1, Lc+Ll] int32
        prompt_embeds,      # [2B, Lt, joint]
        prompt_mask,        # [2B, Lt] bool
        pooled,             # [2B, pooled_dim]
        timesteps,          # [MAX_STEPS] float32 (padded)
        sigmas,             # [MAX_STEPS+1] float32 (padded)
        num_steps,          # [] int32 — actual step count (dynamic)
        guidance,           # scalar
        ab,                 # [2] (alpha, beta) renoise coeffs (stage > 0)
        noise_rng,          # PRNG key for the stage-transition block noise
        pos_offset,         # [2B, 2] table crop origin (mmdit) or None (flux)
        *,
        upsample: bool,
        trainable_tokens: int,
        temp: int,
        height: int,
        width: int,
    ):
        """CFG Euler loop for one stage — a single fori_loop on device.

        Folds the stage transition (nearest-2x upsample + correlated block
        renoise, reference :729-743) into the same program, so each stage is
        exactly ONE device dispatch. ``num_steps`` is a traced scalar:
        image-frame (20-step) and video (10-step) cascades share one compiled
        program per stage."""
        if upsample:
            latents = _up2_nearest(latents)
            noise = sample_block_noise(
                noise_rng, latents.shape, self.scheduler.gamma, latents.dtype)
            latents = ab[0] * latents + ab[1] * noise

        b = latents.shape[0]
        pos2 = jnp.broadcast_to(positions, (2 * b,) + positions.shape[1:])
        time2 = jnp.broadcast_to(time_ids, (2 * b,) + time_ids.shape[1:])
        n = num_steps

        def step(i, lat):
            lat_tokens = patchify(lat.astype(self.dtype))
            lat2 = jnp.concatenate([lat_tokens, lat_tokens], axis=0)
            tokens = jnp.concatenate([cond_tokens, lat2], axis=1)
            t = jnp.broadcast_to(timesteps[i], (2 * b,))
            if pos_offset is None:
                v = self.dit.apply(
                    params, tokens, pos2, time2, prompt_embeds, prompt_mask,
                    pooled, t,
                )
            else:
                v = self.dit.apply(
                    params, tokens, pos2, time2, prompt_embeds, prompt_mask,
                    pooled, t, pos_offset,
                )
            v = v[:, -trainable_tokens:]
            v_uncond, v_cond = jnp.split(v, 2, axis=0)
            v = v_uncond + guidance * (v_cond - v_uncond)
            v_lat = unpatchify(v, temp, height, width)
            return (
                lat.astype(jnp.float32)
                + (sigmas[i + 1] - sigmas[i]) * v_lat.astype(jnp.float32)
            ).astype(lat.dtype)

        return jax.lax.fori_loop(0, n, step, latents)

    def _cond_clip_plan(self, unit_index, stage):
        """Host-side plan of the conditioning clips for (unit, stage):
        ``[(s, lo, hi)]`` oldest-first — each clip takes history frames
        [lo, hi) at stage-``s`` resolution (the reference's history
        construction :1156-1182). History unit 0 is a SINGLE frame (the
        first-frame unit); units j>=1 span frames
        [1+(j-1)*fpu, 1+j*fpu). The newest history unit conditions at the
        current stage's resolution, older units at progressively lower
        stages; everything older than stage 0 collapses into one
        lowest-resolution clip. The ONE source of truth for both the shape
        metadata (`_stage_clip_shapes`) and the packed tokens
        (`_prep_cond_from_history`)."""
        if unit_index == 0:
            return []
        fpu = self.frame_per_unit
        plan = []
        j, s = unit_index - 1, stage
        while j >= 0:
            if s == 0:
                plan.append((0, 0, 1 + j * fpu))  # all remaining history
                break
            plan.append((s, 0, 1) if j == 0
                        else (s, 1 + (j - 1) * fpu, 1 + j * fpu))
            j -= 1
            s -= 1
        return list(reversed(plan))

    def _stage_clip_shapes(self, b, h_lat, w_lat, unit_index, stage):
        """Conditioning clip SHAPES for (unit, stage): the shape-level mirror
        of ``_prep_cond_from_history`` — (B, T, H, W, C) oldest-first, []
        at unit 0."""
        c = self.latent_channels

        def dims(s):
            return (h_lat >> (self.num_stages - 1 - s),
                    w_lat >> (self.num_stages - 1 - s))

        return [(b, hi - lo) + dims(s) + (c,)
                for (s, lo, hi) in self._cond_clip_plan(unit_index, stage)]

    def _prep_cond_from_history(self, history, *, unit_index: int, stage: int,
                                budget: int):
        """history [B, T_hist, H, W, C] -> conditioning tokens
        [2B, budget, 4C]: pyramid + clip slicing + patchify + pad + CFG-double
        as ONE compiled program per (unit, stage) shape."""
        clean_list = latent_pyramid(history, self.num_stages)
        clips = [clean_list[s][:, lo:hi]
                 for (s, lo, hi) in self._cond_clip_plan(unit_index, stage)]
        return self._pack_cond(tuple(clips), budget=budget)

    def generate_one_unit(
        self,
        rng,
        latents,                  # [B, T, h0, w0, C] at LOWEST stage res
        cond_tokens_per_stage,    # per stage [2B, budget, 4C] (or None: unit 0)
        prompt_embeds, prompt_mask, pooled,   # CFG-doubled (2B rows)
        num_inference_steps: Sequence[int],
        guidance: float,
        unit_index: int,
        budgets: Sequence[int],
        h_lat: int,
        w_lat: int,
    ):
        """The stage cascade for one temporal unit (reference :705-788).

        Conditioning is padded to fixed per-stage budgets (zero tokens,
        INVALID time ids) so every unit reuses ONE compiled denoise program
        per stage (SURVEY.md §7.3 #1); the stage transition runs inside the
        same program — 3 device dispatches per unit.
        """
        from ..ops.flash_attention import INVALID_TIME

        b = latents.shape[0]
        fpu = latents.shape[1]
        c = self.latent_channels
        intermed = []
        for i_s in range(self.num_stages):
            timesteps, sigmas = self.scheduler.inference_tables(
                num_inference_steps[i_s], i_s)

            h = h_lat >> (self.num_stages - 1 - i_s)
            w = w_lat >> (self.num_stages - 1 - i_s)
            if i_s > 0:
                alpha, beta = self.scheduler.transition_coefficients(i_s)
            else:
                alpha = beta = 0.0
            rng, sub = jax.random.split(rng)

            # metadata from shapes only (host numpy)
            budget = budgets[i_s]
            positions, time_ids, trainable = self._stage_metadata(
                b, fpu, h_lat, w_lat, unit_index, i_s, budget)

            cond_tokens = (cond_tokens_per_stage[i_s]
                           if cond_tokens_per_stage is not None else None)
            if cond_tokens is None:
                cond_tokens = jnp.zeros((2 * b, budget, 4 * c), self.dtype)

            if self.model_name == "pyramid_mmdit":
                # SD3 sincos table crop origin for the current clip's grid
                g = self.pos_embed_max_size
                top = (g - h // 2) // 2
                left = (g - w // 2) // 2
                pos_offset = jnp.broadcast_to(
                    jnp.asarray([[top, left]], jnp.float32), (2 * b, 2))
            else:
                pos_offset = None

            n = len(timesteps)
            ts_pad = np.zeros((self.MAX_STEPS,), np.float32)
            ts_pad[:n] = timesteps
            sig_pad = np.zeros((self.MAX_STEPS + 1,), np.float32)
            sig_pad[: n + 1] = sigmas

            latents = self._denoise_jit(
                self.dit_params,
                latents,
                cond_tokens,
                jnp.asarray(positions)[None],
                jnp.asarray(time_ids)[None],
                prompt_embeds,
                prompt_mask,
                pooled,
                jnp.asarray(ts_pad),
                jnp.asarray(sig_pad),
                jnp.int32(n),
                jnp.float32(guidance),
                jnp.asarray([alpha, beta], jnp.float32),
                sub,
                pos_offset,
                upsample=(i_s > 0),
                trainable_tokens=trainable,
                temp=fpu,
                height=h,
                width=w,
            )
            intermed.append(latents)
        return intermed

    # ------------------------------------------------------------ generate
    def _stage_metadata(self, b: int, fpu: int, h_lat: int, w_lat: int,
                        unit_index: int, stage: int, budget: int):
        """Host-side (positions, time_ids, trainable) for one (unit, stage)
        denoise program, padded to ``budget`` conditioning tokens. The pad
        sits BETWEEN cond and the current clip (see ``_pack_cond``: fewer
        MASKED flash tiles than a front pad). Shared by ``generate_one_unit``
        and the real-config AOT-lowering test so the traced shapes have one
        source of truth."""
        from ..ops.flash_attention import INVALID_TIME

        h = h_lat >> (self.num_stages - 1 - stage)
        w = w_lat >> (self.num_stages - 1 - stage)
        shapes = self._stage_clip_shapes(b, h_lat, w_lat, unit_index, stage)
        shapes.append((b, fpu, h, w, self.latent_channels))
        positions, time_ids, trainable = clip_metadata(shapes)
        lc = positions.shape[0] - trainable
        assert lc <= budget, (lc, budget)
        pad = budget - lc
        if pad:
            positions = np.concatenate(
                [positions[:lc], np.zeros((pad, 3), np.float32),
                 positions[lc:]], axis=0)
            time_ids = np.concatenate(
                [time_ids[:lc], np.full((pad,), INVALID_TIME, np.int32),
                 time_ids[lc:]], axis=0)
        return positions, time_ids, trainable

    def _cond_token_budget(self, unit_index: int, h_lat: int, w_lat: int):
        """Per-stage conditioning-token budget at history length
        ``unit_index`` (token count of ``_stage_clip_shapes`` + rounding)."""
        fpu = self.frame_per_unit
        budgets = []
        for i_s in range(self.num_stages):
            shapes = self._stage_clip_shapes(1, h_lat, w_lat, unit_index, i_s)
            toks = sum(t * (h // 2) * (w // 2) for (_, t, h, w, _) in shapes)
            h = h_lat >> (self.num_stages - 1 - i_s)
            w = w_lat >> (self.num_stages - 1 - i_s)
            latent_toks = fpu * (h // 2) * (w // 2)
            # round so the full sequence (text 128 + cond + current) lands on
            # a flash-kernel block boundary (512-tiles; measured fastest)
            total = 128 + toks + latent_toks
            toks += (-total) % (512 if total > 512 else 128)
            budgets.append(toks)
        return budgets

    def generate(
        self,
        rng,
        prompt_embeds, prompt_mask, pooled_embeds,          # positive [B,...]
        negative_embeds, negative_mask, negative_pooled,    # negative [B,...]
        height: int,
        width: int,
        temp: int = 1,
        num_inference_steps: Sequence[int] | int = 20,
        video_num_inference_steps: Sequence[int] | int = 10,
        guidance_scale: float = 7.0,
        video_guidance_scale: float = 5.0,
        use_linear_guidance: bool = False,
        alpha: float = 0.5,
        min_guidance_scale: float = 2.0,
        output_type: str = "latent",
        save_memory: bool = True,
        input_image_latent: Optional[jnp.ndarray] = None,
        progress_callback=None,
        release_dit_before_decode: bool = False,
    ):
        """Text-to-video (reference ``generate`` :1005-1219); pass
        ``input_image_latent`` ([B,1,h,w,C], already normalized) for i2v
        (reference ``generate_i2v`` :790-1003).

        ``progress_callback(info: dict)`` — per-unit/per-phase progress for
        serving UIs (the reference app's Gradio progress callbacks,
        `app.py:186-243`). When set, each unit ends with a tiny forced
        device sync so reported progress tracks the chip, not the dispatch
        queue (~27 ms/unit overhead; benchmarks pass no callback)."""
        if isinstance(num_inference_steps, int):
            num_inference_steps = [num_inference_steps] * self.num_stages
        if isinstance(video_num_inference_steps, int):
            video_num_inference_steps = [video_num_inference_steps] * self.num_stages

        # CFG concat: [negative, positive]
        pe = jnp.concatenate([negative_embeds, prompt_embeds], axis=0).astype(self.dtype)
        pm = jnp.concatenate([negative_mask, prompt_mask], axis=0)
        pp = jnp.concatenate([negative_pooled, pooled_embeds], axis=0).astype(self.dtype)

        b = prompt_embeds.shape[0]
        h_lat, w_lat = height // self.downsample, width // self.downsample
        min_div = self.downsample * 2 * (2 ** (self.num_stages - 1))
        assert height % min_div == 0 and width % min_div == 0, (
            f"height/width must be divisible by {min_div} "
            f"(8x VAE x 2 patch x {2**(self.num_stages-1)} pyramid)")
        rng, sub = jax.random.split(rng)
        latents = jax.random.normal(
            sub, (b, temp, h_lat, w_lat, self.latent_channels), jnp.float32)
        # start from the lowest stage: bilinear down with *2 noise correction
        for _ in range(self.num_stages - 1):
            latents = _down2(latents) * 2

        fpu = self.frame_per_unit
        generated: List[jnp.ndarray] = []
        if input_image_latent is not None:
            # i2v (reference :902,928): unit 0 = the encoded image; generate
            # units 1..num_units-1 from noise slices (unit u -> frames
            # [(u-1)*fpu, u*fpu)).
            generated.append(input_image_latent.astype(jnp.float32))
            num_units = temp // fpu
            unit_range = range(1, num_units)
        else:
            # t2v (reference :1120): unit 0 = first frame; unit u>0 -> frames
            # [1+(u-1)*fpu, 1+u*fpu).
            num_units = 1 + (temp - 1) // fpu
            unit_range = range(num_units)

        # per-UNIT conditioning-token budgets: early units have short
        # histories and run at a fraction of the final unit's sequence
        # length; the 512-boundary rounding in ``_cond_token_budget``
        # clusters the budgets so compiled denoise programs are still shared
        # across runs of nearby units (a handful of shapes per stage, all
        # warm after the first video at a given resolution).
        # per-unit linear guidance decay (reference :1075-1079,1133-1135)
        if use_linear_guidance:
            g_list = [max(guidance_scale - alpha * t_, min_guidance_scale)
                      for t_ in range(temp)]
        for done_units, unit_index in enumerate(unit_range, start=1):
            pad_cond_to = self._cond_token_budget(unit_index, h_lat, w_lat)
            g = g_list[unit_index] if use_linear_guidance else guidance_scale
            vg = g_list[unit_index] if use_linear_guidance else video_guidance_scale
            rng, sub = jax.random.split(rng)
            if unit_index == 0:
                intermed = self.generate_one_unit(
                    sub, latents[:, :1], None, pe, pm, pp,
                    num_inference_steps, g,
                    unit_index=0, budgets=pad_cond_to, h_lat=h_lat,
                    w_lat=w_lat,
                )
            else:
                history = jnp.concatenate(generated, axis=1)
                cond = [
                    self._prep_cond_jit(
                        history, unit_index=unit_index, stage=i_s,
                        budget=pad_cond_to[i_s])
                    for i_s in range(self.num_stages)
                ]
                if input_image_latent is None:
                    start = 1 + (unit_index - 1) * fpu
                else:
                    start = (unit_index - 1) * fpu
                intermed = self.generate_one_unit(
                    sub, latents[:, start: start + fpu], cond, pe, pm, pp,
                    video_num_inference_steps, vg,
                    unit_index=unit_index, budgets=pad_cond_to, h_lat=h_lat,
                    w_lat=w_lat,
                )
            generated.append(intermed[-1].astype(jnp.float32))
            if progress_callback is not None:
                # force the unit's work to finish so progress is honest
                float(jnp.sum(generated[-1][..., :1, :1, :1]))
                # report loop position, not unit_index: under i2v the
                # range starts at 1 and unit_index+1 would overflow the
                # total (unit N+1 of N in the serving progress bar)
                progress_callback({
                    "phase": "denoise",
                    "unit": done_units,
                    "units": len(unit_range),
                })

        latents_full = jnp.concatenate(generated, axis=1)
        # force a tiny host transfer: on tunneled platforms (axon)
        # jax.block_until_ready is a no-op, which would mis-attribute the
        # dit/decode phase split below. ~27 ms round trip, once per video.
        float(jnp.sum(latents_full[..., :1, :1, :1]))
        import time as _time
        t_gen_done = _time.time()
        if output_type == "latent":
            return latents_full
        if release_dit_before_decode:
            # the reference moves the DiT to host RAM before decoding
            # (pipeline :1208-1216) to hand the VAE its memory; on TPU the
            # equivalent is dropping the device buffers — decode_settings
            # then plans bigger, less-redundant windows into the freed HBM.
            # One-shot semantics: the caller must re-assign ``dit_params``
            # (re-upload/re-init) before the next generate().
            self.dit_params = None
            import gc as _gc
            _gc.collect()
        if progress_callback is not None:
            progress_callback({"phase": "decode", "unit": len(unit_range),
                               "units": len(unit_range)})
        out = self.decode_latent(latents_full, save_memory=save_memory)
        float(jnp.sum(out[..., :1, :1, :1].astype(jnp.float32)))
        # host-side phase split for benchmarking/observability
        self.last_decode_seconds = _time.time() - t_gen_done
        return out

    def generate_i2v(self, rng, image_latent_raw, *args, **kwargs):
        """i2v: unit 0 is the VAE-encoded input image. ``image_latent_raw``
        is the raw VAE-encoded latent (pre-normalization, [B,1,h,w,C])."""
        img = (image_latent_raw - self.vae_shift_factor) * self.vae_scale_factor
        return self.generate(rng, *args, input_image_latent=img, **kwargs)

    # -------------------------------------------------------------- decode
    def decode_latent(self, latents, save_memory: bool = True):
        """Un-normalize + chunked (and optionally tiled) causal VAE decode
        (reference :1221-1243). Returns uint8 frames [B, F, H, W, 3]."""
        from ..models.vae.model import (chunk_decode, tiled_decode,
                                        tiled_decode_planned)

        assert self.vae is not None, "pipeline built without a VAE"
        z = self.denormalize_latent(latents).astype(jnp.float32)
        s = decode_settings(save_memory, _device_hbm_gb(),
                            dit_resident=self.dit_params is not None)
        hl, wl = z.shape[2], z.shape[3]
        budget = s.get("px_window_budget")
        if budget is not None and (hl * wl <= budget or budget // hl >= 64):
            # memory-planned decode (16 GB class, DiT released): spend the
            # measured budget on the least-redundant plan that fits.
            # Window 2 beats window 1 at equal coverage (~14% per px,
            # measured), so every rung tries w2 first.
            if hl * wl * 2 <= budget:
                img = chunk_decode(self.vae, self.vae_params, z,
                                   window_size=2)
            elif hl * wl <= budget:
                img = chunk_decode(self.vae, self.vae_params, z,
                                   window_size=1)
            elif budget // (hl * 2) >= 32:
                # full-height window-2 column strips (one seam axis): at
                # 768p, 4x 46-wide strips = 1.15x redundancy, 27.6 s vs
                # 29.9 s for the reference-style 384px walk (measured)
                img = tiled_decode_planned(
                    self.vae, self.vae_params, z, tile_h=hl,
                    tile_w=budget // (hl * 2), window_size=2)
            else:
                # very tall frames: window-1 strips before giving up
                img = tiled_decode_planned(
                    self.vae, self.vae_params, z, tile_h=hl,
                    tile_w=budget // hl, window_size=1)
        # Tile only when a whole frame would blow HBM — untiled avoids the
        # overlap recompute and the per-tile dispatch chain (the reference
        # always tiles because consumer GPUs are small).
        elif hl * wl > s["untiled_max_latent"] ** 2:
            img = tiled_decode(self.vae, self.vae_params, z,
                               tile_sample_min_size=s["tile"],
                               temporal_chunk=True, window_size=s["window"],
                               overlap_factor=s["overlap"])
        else:
            img = chunk_decode(self.vae, self.vae_params, z,
                               window_size=s["untiled_window"])
        img = jnp.clip(img * 127.5 + 127.5, 0, 255).astype(jnp.uint8)
        return img
