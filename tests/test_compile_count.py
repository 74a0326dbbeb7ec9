"""Compile-count guard (VERDICT r1 #8).

The pipeline claims its per-unit conditioning-budget rounding keeps the
number of distinct denoise-loop compilations per video to a handful of
shapes per stage (`pyramid_pipeline.py` ``_cond_token_budget``). A silent
regression here (e.g. dropping the 512-boundary rounding, or leaking a
traced value into a static arg) multiplies wall-clock by recompilation —
exactly the failure mode SURVEY §7.3 #1 warns about. This test pins the
actual ``jax.jit`` cache size to the predicted distinct-shape count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyramid_flow_tpu.models.flux.model import FluxConfig, PyramidFluxTransformer
from pyramid_flow_tpu.pipeline.pyramid_pipeline import PyramidFlowPipeline

CFG = FluxConfig(
    in_channels=16, num_layers=1, num_single_layers=1, attention_head_dim=8,
    num_attention_heads=4, joint_attention_dim=32, pooled_projection_dim=24,
    axes_dims_rope=(4, 2, 2),
)


def _cache_size(jitted):
    # jax's jitted-callable cache-size probe (name varies across versions)
    for attr in ("_cache_size",):
        f = getattr(jitted, attr, None)
        if f is not None:
            return f()
    pytest.skip("jax version exposes no jit cache-size probe")


def test_denoise_compile_count_bounded():
    dit = PyramidFluxTransformer(config=CFG, dtype=jnp.float32)
    params = dit.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16)), jnp.zeros((1, 16, 3)),
        jnp.zeros((1, 16), jnp.int32), jnp.zeros((1, 8, 32)),
        jnp.ones((1, 8), bool), jnp.zeros((1, 24)), jnp.zeros((1,)))
    pipe = PyramidFlowPipeline(dit, params, latent_channels=4,
                               dtype=jnp.float32)

    temp, height, width = 4, 64, 64
    h_lat, w_lat = height // 8, width // 8

    emb = jnp.zeros((1, 8, 32))
    mask = jnp.ones((1, 8), bool)
    pooled = jnp.zeros((1, 24))
    pipe.generate(
        jax.random.PRNGKey(1), emb, mask, pooled, emb, mask, pooled,
        height=height, width=width, temp=temp,
        num_inference_steps=[2, 2, 2], video_num_inference_steps=[2, 2, 2],
        guidance_scale=5.0, video_guidance_scale=4.0, output_type="latent")

    # predicted distinct compiled shapes: every unit (incl. unit 0) buckets
    # by its rounded per-stage budget
    buckets = set()
    for unit in range(temp):
        budgets = pipe._cond_token_budget(unit, h_lat, w_lat)
        for i_s in range(pipe.num_stages):
            buckets.add((i_s, budgets[i_s]))
    expected = len(buckets)

    actual = _cache_size(pipe._denoise_jit)
    assert actual == expected, (
        f"denoise loop compiled {actual} distinct programs, predicted "
        f"{expected} — the shape-bucketing contract regressed")
    # absolute ceiling: a handful of shapes per stage per video
    assert actual <= pipe.num_stages * (temp + 1)


def test_budget_rounding_buckets_shapes():
    """The 512/128-boundary rounding must merge nearby history lengths at
    production resolutions: at 768p, 15 AR units must NOT produce 15
    distinct stage-2 shapes' worth of compilations... they may — but the
    budget must be monotone and 128-aligned so padding never truncates."""
    dit = PyramidFluxTransformer(config=CFG, dtype=jnp.float32)
    params = jax.eval_shape(
        lambda: dit.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16)),
            jnp.zeros((1, 16, 3)), jnp.zeros((1, 16), jnp.int32),
            jnp.zeros((1, 8, 32)), jnp.ones((1, 8), bool),
            jnp.zeros((1, 24)), jnp.zeros((1,))))
    pipe = PyramidFlowPipeline(dit, params, latent_channels=4,
                               dtype=jnp.float32)
    h_lat, w_lat = 96, 160  # 768x1280
    prev = None
    for unit in range(1, 16):
        budgets = pipe._cond_token_budget(unit, h_lat, w_lat)
        for i_s, b in enumerate(budgets):
            shapes = pipe._stage_clip_shapes(1, h_lat, w_lat, unit, i_s)
            toks = sum(t * (h // 2) * (w // 2) for (_, t, h, w, _) in shapes)
            assert b >= toks, "budget must cover the conditioning tokens"
        if prev is not None:
            assert all(b >= p for b, p in zip(budgets, prev)), (
                "budgets must grow monotonically with history")
        prev = budgets
