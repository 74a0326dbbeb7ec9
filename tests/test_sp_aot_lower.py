"""AOT-lower the REAL-config SP denoise program on the virtual CPU mesh.

``tests/test_sp_bench_shape.py`` proves SP==single-device numerics at the
bench's exact token counts, but at toy head dims — so the first v5p-8 run
would still be the first time GSPMD/shard_map ever traces the REAL program
(24 heads x 64, 19+38 blocks, ~2.9B params) at L=12288 with sp shardings
(VERDICT r4 #3). Tracing + lowering is enough to catch real-dim sharding
errors (shard_map traces the per-shard body — including the Pallas kernel's
block specs — at the per-shard L) and costs no compile/execute, so it runs
on CPU with ``jax.eval_shape``'d params instead of 2.9B real floats.

Reference analogue: the 4-GPU SP config in `scripts/inference_multigpu.sh`
(`pyramid_dit/flux_modules/modeling_flux_block.py:103-186` attention
sharding).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("sp,stage,expect_L", [
    (2, 2, 12288),   # longest bench program, divides exactly
    (8, 2, 12288),   # longest program under the bench's max sp
    (8, 1, 5632),    # 5632 % (8*128) != 0 -> pad-to-sp*128 kernel branch
])
def test_real_config_denoise_lowers_under_sp(sp, stage, expect_L):
    from pyramid_flow_tpu.models.flux.model import (
        FluxConfig, PyramidFluxTransformer)
    from pyramid_flow_tpu.parallel.mesh import MeshConfig, make_mesh
    from pyramid_flow_tpu.pipeline.pyramid_pipeline import PyramidFlowPipeline

    # bench.py's partial-host mesh construction: first sp devices
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, sp=sp),
                     devices=jax.devices()[:sp])

    cfg = FluxConfig()  # the released miniFLUX architecture — no shrinking
    assert (cfg.num_attention_heads, cfg.attention_head_dim) == (24, 64)
    assert (cfg.num_layers, cfg.num_single_layers) == (19, 38)
    dit = PyramidFluxTransformer(config=cfg, dtype=jnp.bfloat16,
                                 param_dtype=jnp.bfloat16, mesh=mesh)

    b = 1
    S = jax.ShapeDtypeStruct
    tok = S((b, 64, cfg.in_channels), jnp.bfloat16)
    pos = S((b, 64, 3), jnp.float32)
    tm = S((b, 64), jnp.int32)
    text = S((b, 128, cfg.joint_attention_dim), jnp.bfloat16)
    mask = S((b, 128), jnp.bool_)
    pooled = S((b, cfg.pooled_projection_dim), jnp.bfloat16)
    params = jax.eval_shape(
        dit.init, jax.random.PRNGKey(0), tok, pos, tm, text, mask, pooled,
        S((b,), jnp.float32))
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    assert n_params > 2.5e9, f"not the release-scale model: {n_params:,}"

    pipe = PyramidFlowPipeline(dit, params, None, None, dtype=jnp.bfloat16)

    # 768p final unit (unit 15): stage 2 is the longest sequence the bench
    # produces (text 128 + cond budget 8320 + clip 3840 = L 12288, a
    # multiple of sp*128 for both sp values); stage 1 (L 5632) is the real
    # bench program whose length forces the pad-to-sp*128 kernel branch
    # under sp=8. Lengths come from the pipeline's own metadata so this
    # test tracks the production budgets, not a hand copy of them.
    h_lat, w_lat = 768 // 8, 1280 // 8
    unit_index = 15
    budget = pipe._cond_token_budget(unit_index, h_lat, w_lat)[stage]
    positions, time_ids, trainable = pipe._stage_metadata(
        b, 1, h_lat, w_lat, unit_index, stage, budget)
    assert positions.shape[0] + 128 == expect_L, positions.shape

    c = pipe.latent_channels
    # current-stage grid; incoming latents are at the PREVIOUS stage's res
    # (the program upsamples internally when upsample=True)
    h = h_lat >> (pipe.num_stages - 1 - stage)
    w = w_lat >> (pipe.num_stages - 1 - stage)
    args = dict(
        params=params,
        latents=S((b, 1, h // 2, w // 2, c), jnp.bfloat16),
        cond_tokens=S((2 * b, budget, 4 * c), jnp.bfloat16),
        positions=jnp.asarray(positions)[None],
        time_ids=jnp.asarray(time_ids)[None],
        prompt_embeds=S((2 * b, 128, cfg.joint_attention_dim), jnp.bfloat16),
        prompt_mask=S((2 * b, 128), jnp.bool_),
        pooled=S((2 * b, cfg.pooled_projection_dim), jnp.bfloat16),
        timesteps=S((pipe.MAX_STEPS,), jnp.float32),
        sigmas=S((pipe.MAX_STEPS + 1,), jnp.float32),
        num_steps=S((), jnp.int32),
        guidance=S((), jnp.float32),
        ab=S((2,), jnp.float32),
        noise_rng=jax.random.PRNGKey(0),
        pos_offset=None,
    )
    lowered = pipe._denoise_jit.lower(
        *args.values(), upsample=True, trainable_tokens=trainable,
        temp=1, height=h, width=w)

    # the lowered module must exist and the GSPMD annotations must have
    # resolved onto the sp mesh (shard_map bodies traced at per-shard L)
    hlo = lowered.as_text()
    assert "sharding" in hlo, "no sharding annotations in the lowered module"
    in_info = jax.tree.leaves(lowered.args_info)
    assert in_info, "empty lowering"
