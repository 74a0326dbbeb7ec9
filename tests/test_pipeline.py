"""End-to-end pipeline tests with tiny models: t2v, i2v, noising math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyramid_flow_tpu.models.flux.model import FluxConfig, PyramidFluxTransformer
from pyramid_flow_tpu.models.vae.model import CausalVideoVAE, VAEConfig
from pyramid_flow_tpu.pipeline.noising import (
    add_ar_noise_stage,
    add_pyramid_noise_stage,
    latent_pyramid,
    noise_pyramid,
    sample_stage_length,
)
from pyramid_flow_tpu.pipeline.pyramid_pipeline import PyramidFlowPipeline
from pyramid_flow_tpu.schedulers.flow_matching import (
    PyramidFlowMatchEulerDiscreteScheduler,
)

DIT_CFG = FluxConfig(
    in_channels=16,
    num_layers=1,
    num_single_layers=1,
    attention_head_dim=8,
    num_attention_heads=4,
    joint_attention_dim=32,
    pooled_projection_dim=24,
    axes_dims_rope=(4, 2, 2),
)
VAE_CFG = VAEConfig(
    latent_channels=4,
    block_out_channels=(8, 8, 16, 16),
    encoder_layers_per_block=(1, 1, 1, 1),
    decoder_layers_per_block=(1, 1, 1, 1),
    num_groups=4,
)


@pytest.fixture(scope="module")
def pipeline():
    dit = PyramidFluxTransformer(config=DIT_CFG, dtype=jnp.float32)
    tokens = jnp.zeros((2, 16, 16))
    pos = jnp.zeros((2, 16, 3))
    time = jnp.zeros((2, 16), jnp.int32)
    text = jnp.zeros((2, 8, 32))
    mask = jnp.ones((2, 8), bool)
    pooled = jnp.zeros((2, 24))
    ts = jnp.zeros((2,))
    dit_params = dit.init(
        jax.random.PRNGKey(0), tokens, pos, time, text, mask, pooled, ts)
    # randomize zero-init layers so generation produces signal
    leaves, treedef = jax.tree.flatten(dit_params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    dit_params = jax.tree.unflatten(
        treedef,
        [0.02 * jax.random.normal(k, p.shape, p.dtype) for k, p in zip(keys, leaves)],
    )

    vae = CausalVideoVAE(config=VAE_CFG)
    vae_params = vae.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 1, 32, 32, 3)),
        rng=jax.random.PRNGKey(3))
    return PyramidFlowPipeline(
        dit, dit_params, vae, vae_params,
        latent_channels=4, dtype=jnp.float32,
    )


def _text_inputs(b=1):
    k = jax.random.PRNGKey(7)
    emb = jax.random.normal(k, (b, 8, 32))
    mask = jnp.ones((b, 8), bool)
    pooled = jax.random.normal(k, (b, 24))
    return emb, mask, pooled


@pytest.mark.slow
def test_generate_single_image(pipeline):
    emb, mask, pooled = _text_inputs()
    out = pipeline.generate(
        jax.random.PRNGKey(0), emb, mask, pooled, emb * 0, mask, pooled * 0,
        height=64, width=64, temp=1,
        num_inference_steps=[2, 2, 2], video_num_inference_steps=[2, 2, 2],
        output_type="latent",
    )
    assert out.shape == (1, 1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_generate_video_ar(pipeline):
    emb, mask, pooled = _text_inputs()
    out = pipeline.generate(
        jax.random.PRNGKey(1), emb, mask, pooled, emb * 0, mask, pooled * 0,
        height=64, width=64, temp=3,
        num_inference_steps=[2, 2, 2], video_num_inference_steps=[1, 1, 1],
        output_type="latent",
    )
    assert out.shape == (1, 3, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_generate_i2v(pipeline):
    emb, mask, pooled = _text_inputs()
    img_latent = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 8, 8, 4))
    out = pipeline.generate_i2v(
        jax.random.PRNGKey(3), img_latent, emb, mask, pooled,
        emb * 0, mask, pooled * 0,
        height=64, width=64, temp=3,
        num_inference_steps=[1, 1, 1], video_num_inference_steps=[1, 1, 1],
        output_type="latent",
    )
    assert out.shape == (1, 3, 8, 8, 4)


@pytest.mark.parametrize("fpu", [1, 2, 4])
def test_cond_metadata_matches_packed_clips(pipeline, fpu):
    """The shape metadata (`_stage_clip_shapes`, drives RoPE positions and
    time ids) must agree with the clips `_prep_cond_from_history` actually
    packs — regression for frame_per_unit>1, where history unit 0 has ONE
    frame, not fpu (metadata previously claimed fpu and the pad landed past
    the real tokens, giving zero-pad tokens VALID time ids)."""
    dit, params = pipeline.dit, pipeline.dit_params
    pipe = PyramidFlowPipeline(
        dit, params, None, None, latent_channels=4, dtype=jnp.float32,
        frame_per_unit=fpu)
    h_lat = w_lat = 8
    for unit_index in range(1, 5):
        t_hist = 1 + (unit_index - 1) * fpu
        history = jnp.zeros((1, t_hist, h_lat, w_lat, 4))
        for stage in range(pipe.num_stages):
            plan = pipe._cond_clip_plan(unit_index, stage)
            # plan covers the whole history exactly, oldest-first, no overlap
            assert plan[0][1] == 0 and plan[-1][2] == t_hist
            assert all(a[2] == b_[1] for a, b_ in zip(plan, plan[1:]))
            shapes = pipe._stage_clip_shapes(1, h_lat, w_lat, unit_index, stage)
            clips = [
                latent_pyramid(history, pipe.num_stages)[s][:, lo:hi]
                for (s, lo, hi) in plan
            ]
            assert [c.shape for c in clips] == [tuple(s) for s in shapes], (
                fpu, unit_index, stage)


@pytest.mark.slow
def test_generate_video_ar_frame_per_unit_2(pipeline):
    """E2E: temp=4 with frame_per_unit=2 (2 AR units after the first frame).
    Only fpu=1 was exercised before; this drives the unit-0-is-one-frame
    history bookkeeping through real generation."""
    pipe = PyramidFlowPipeline(
        pipeline.dit, pipeline.dit_params, pipeline.vae, pipeline.vae_params,
        latent_channels=4, dtype=jnp.float32, frame_per_unit=2)
    emb, mask, pooled = _text_inputs()
    out = pipe.generate(
        jax.random.PRNGKey(5), emb, mask, pooled, emb * 0, mask, pooled * 0,
        height=64, width=64, temp=5,
        num_inference_steps=[1, 1, 1], video_num_inference_steps=[1, 1, 1],
        output_type="latent",
    )
    assert out.shape == (1, 5, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_decode_pixels(pipeline):
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 8, 8, 4)) * 0.3
    img = pipeline.decode_latent(z)
    assert img.shape == (1, 9, 64, 64, 3)
    assert img.dtype == jnp.uint8


# ------------------------------------------------------------------ noising
@pytest.fixture(scope="module")
def sched():
    return PyramidFlowMatchEulerDiscreteScheduler()


def test_noise_pyramid_variance():
    pyr = noise_pyramid(jax.random.PRNGKey(0), (4, 2, 32, 32, 8), 3)
    assert len(pyr) == 3
    assert pyr[0].shape == (4, 2, 8, 8, 8)
    assert pyr[2].shape == (4, 2, 32, 32, 8)
    # the *2 per level roughly preserves unit variance (2x2 mean of unit
    # gaussians has var 1/4, scaled by 4)
    for lvl in pyr:
        assert 0.8 < float(jnp.var(lvl)) < 1.3


def test_full_sequence_noising(sched):
    latents = [
        jax.random.normal(jax.random.PRNGKey(i), (2, 2, 8 * 2**i, 8 * 2**i, 4))
        for i in range(3)
    ]
    for stage in range(3):
        batch = add_pyramid_noise_stage(
            jax.random.PRNGKey(stage), sched, latents, stage, 3)
        assert len(batch.clips) == 1
        assert batch.clips[0].shape == latents[stage].shape
        assert batch.targets.shape == latents[stage].shape
        assert batch.timesteps.shape == (2,)
        # timestep lies inside the stage window
        ts = np.asarray(batch.timesteps)
        lo = sched.timesteps_per_stage[stage][-1]
        hi = sched.timesteps_per_stage[stage][0]
        assert (ts >= lo - 1e-4).all() and (ts <= hi + 1e-4).all()


@pytest.mark.slow
def test_ar_noising_structure(sched):
    t = 8  # 8 temporal latent frames
    latents = [
        jax.random.normal(jax.random.PRNGKey(i), (2, t, 4 * 2**i, 4 * 2**i, 4))
        for i in range(3)
    ]
    # stage 2 with 5 units: [stage0 remainder, stage1, corrupted stage2, noisy]
    batch = add_ar_noise_stage(
        jax.random.PRNGKey(0), sched, latents, stage=2, num_stages=3,
        num_units=5, frame_per_unit=1)
    assert batch.targets.shape == (2, 1, 16, 16, 4)
    assert batch.clips[-1].shape == (2, 1, 16, 16, 4)   # noisy current
    assert batch.clips[-2].shape == (2, 1, 16, 16, 4)   # corrupted last cond
    assert batch.clips[-3].shape == (2, 1, 8, 8, 4)     # stage 1
    assert batch.clips[0].shape == (2, 2, 4, 4, 4)      # stage 0 remainder
    total_frames = sum(c.shape[1] for c in batch.clips)
    assert total_frames == 5


def test_ar_noising_single_unit(sched):
    latents = [
        jax.random.normal(jax.random.PRNGKey(i), (2, 4, 4 * 2**i, 4 * 2**i, 4))
        for i in range(3)
    ]
    batch = add_ar_noise_stage(
        jax.random.PRNGKey(0), sched, latents, stage=1, num_stages=3,
        num_units=1)
    assert len(batch.clips) == 1


def test_sample_stage_length_rotation():
    # 8 ranks in a sync group cover distinct AR positions
    lens = [sample_stage_length(r, step=0)[2] for r in range(8)]
    assert lens == list(range(1, 9))
    lens_turn1 = [sample_stage_length(r, step=1)[2] for r in range(8)]
    assert lens_turn1 == list(range(9, 17))
    # low/mid lengths complement: high + mid == 1 + max_units
    for r in range(8):
        low, mid, high = sample_stage_length(r, step=0)
        assert mid == 1 + 31 - high
        assert low == mid


@pytest.mark.slow
def test_generate_batched_prompts(pipeline):
    """batch > 1: two prompts in one generate call (CFG doubles to 4 rows)."""
    emb, mask, pooled = _text_inputs(b=2)
    out = pipeline.generate(
        jax.random.PRNGKey(5), emb, mask, pooled, emb * 0, mask, pooled * 0,
        height=64, width=64, temp=2,
        num_inference_steps=[2, 2, 2], video_num_inference_steps=[1, 1, 1],
        output_type="latent",
    )
    assert out.shape == (2, 2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    # the two rows saw different prompts -> different videos
    a, bb = np.asarray(out[0]), np.asarray(out[1])
    assert np.abs(a - bb).max() > 1e-4


def test_decode_settings_capacity_derived():
    """VERDICT r2 #9: decode tiling derives from HBM capacity — v5e 16 GB
    keeps the measured memory-safe floor, a v5p-class chip (95 GB) gets
    bigger tiles, window-2 untiled decode, and a 4x larger untiled area."""
    from pyramid_flow_tpu.pipeline.pyramid_pipeline import decode_settings

    v5e = decode_settings(save_memory=True, hbm_gb=16.0)
    assert v5e == {"tile": 384, "overlap": 0.125, "window": 2,
                   "untiled_window": 1, "untiled_max_latent": 96}

    v5p = decode_settings(save_memory=True, hbm_gb=95.0)
    assert v5p["tile"] == 512 and v5p["untiled_window"] == 2
    assert v5p["untiled_max_latent"] == 192  # 768p frames decode untiled

    # save_memory=False never uses the window-1 dodge on any chip
    for gb in (16.0, 95.0):
        s = decode_settings(save_memory=False, hbm_gb=gb)
        assert s["untiled_window"] == 2 and s["tile"] == 512


def test_decode_settings_dit_released():
    """With the DiT released before decode (the reference's pre-decode CPU
    offload, pipeline :1208-1216), the 16 GB plan switches to the measured
    px-window budget: full-height window-1 strips at 768p, untiled window-2
    at 384p. Big-HBM chips never need the budget."""
    from pyramid_flow_tpu.pipeline.pyramid_pipeline import decode_settings

    rel = decode_settings(save_memory=True, hbm_gb=16.0, dit_resident=False)
    budget = rel["px_window_budget"]
    assert budget >= 7680
    # 768p latent 96x160: untiled doesn't fit, strips do
    assert 96 * 160 > budget and budget // 96 >= 32
    # 384p latent 48x80: untiled window-2 fits outright
    assert 48 * 80 * 2 <= budget
    # resident and big-HBM plans carry no budget (previous behavior)
    assert "px_window_budget" not in decode_settings(True, 16.0)
    assert "px_window_budget" not in decode_settings(True, 95.0, False)


def test_generate_release_dit_before_decode(pipeline, monkeypatch):
    """release_dit_before_decode drops the DiT params after denoise so the
    VAE decode can spend the freed HBM (one-shot semantics)."""
    import pyramid_flow_tpu.pipeline.pyramid_pipeline as pp

    monkeypatch.setattr(pp, "_device_hbm_gb", lambda: 16.0)
    saved = pipeline.dit_params
    try:
        emb, mask, pooled = _text_inputs()
        out = pipeline.generate(
            jax.random.PRNGKey(5), emb, mask, pooled,
            emb * 0, mask, pooled * 0,
            height=64, width=64, temp=1,
            num_inference_steps=[1, 1, 1],
            video_num_inference_steps=[1, 1, 1],
            output_type="pixels", release_dit_before_decode=True,
        )
        assert out.shape == (1, 1, 64, 64, 3) and out.dtype == jnp.uint8
        assert pipeline.dit_params is None  # released
    finally:
        pipeline.dit_params = saved  # module-scoped fixture: restore
