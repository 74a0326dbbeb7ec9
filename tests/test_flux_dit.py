"""miniFLUX DiT tests: shapes, zero-init identity, temporal causality through
the full stack, and packing round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyramid_flow_tpu.models.flux.model import FluxConfig, PyramidFluxTransformer
from pyramid_flow_tpu.pipeline.packing import (
    clip_positions,
    pack_clips,
    patchify,
    unpatchify,
)

TINY = FluxConfig(
    in_channels=16,  # 2x2 patch x 4ch latent
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=8,
    num_attention_heads=4,
    joint_attention_dim=32,
    pooled_projection_dim=24,
    axes_dims_rope=(4, 2, 2),
)


def make_model_inputs(key, b=2, l=24, lt=8, cfg=TINY):
    ks = jax.random.split(key, 4)
    tokens = jax.random.normal(ks[0], (b, l, cfg.in_channels))
    pos = jnp.asarray(
        np.stack(
            [
                np.repeat(np.arange(l // 8), 8),          # t
                np.tile(np.arange(8, dtype=np.float32) // 4, l // 8),
                np.tile(np.arange(8, dtype=np.float32) % 4, l // 8),
            ],
            -1,
        )[None].repeat(b, 0)
    )
    time = pos[..., 0].astype(jnp.int32)
    text = jax.random.normal(ks[1], (b, lt, cfg.joint_attention_dim))
    mask = jnp.ones((b, lt), bool).at[:, -2:].set(False)
    pooled = jax.random.normal(ks[2], (b, cfg.pooled_projection_dim))
    ts = jnp.full((b,), 500.0)
    return tokens, pos, time, text, mask, pooled, ts


@pytest.fixture(scope="module")
def model_and_params():
    model = PyramidFluxTransformer(config=TINY)
    inputs = make_model_inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), *inputs)
    return model, params


def test_forward_shape(model_and_params):
    model, params = model_and_params
    inputs = make_model_inputs(jax.random.PRNGKey(2))
    out = model.apply(params, *inputs)
    assert out.shape == (2, 24, TINY.in_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_zero_init_output_is_zero(model_and_params):
    """proj_out is zero-init (reference :182-183): a fresh model outputs 0."""
    model, params = model_and_params
    inputs = make_model_inputs(jax.random.PRNGKey(3))
    out = model.apply(params, *inputs)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def _randomize(params, key):
    """Replace every param with random values (zero-init layers included) so
    outputs carry real signal."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    leaves = [
        0.05 * jax.random.normal(k, p.shape, p.dtype) for k, p in zip(keys, leaves)
    ]
    return jax.tree.unflatten(treedef, leaves)


@pytest.mark.slow
def test_temporal_causality_end_to_end(model_and_params):
    """Perturbing the last frame's tokens must not change earlier frames'
    outputs (temporal-causal attention through all blocks)."""
    model, params = model_and_params
    params = _randomize(params, jax.random.PRNGKey(42))
    tokens, pos, time, text, mask, pooled, ts = make_model_inputs(
        jax.random.PRNGKey(4))
    out1 = model.apply(params, tokens, pos, time, text, mask, pooled, ts)
    tokens2 = tokens.at[:, -8:].add(1.0)  # last frame (8 tokens/frame)
    out2 = model.apply(params, tokens2, pos, time, text, mask, pooled, ts)
    np.testing.assert_allclose(
        np.asarray(out1[:, :-8]), np.asarray(out2[:, :-8]), atol=1e-5)
    assert not np.allclose(out1[:, -8:], out2[:, -8:], atol=1e-5)


@pytest.mark.slow
def test_text_mask_invariance(model_and_params):
    """Padded text token content must not affect outputs."""
    model, params = model_and_params
    params = _randomize(params, jax.random.PRNGKey(43))
    tokens, pos, time, text, mask, pooled, ts = make_model_inputs(
        jax.random.PRNGKey(5))
    out1 = model.apply(params, tokens, pos, time, text, mask, pooled, ts)
    text2 = text.at[:, -2:].set(99.0)  # masked positions
    out2 = model.apply(params, tokens, pos, time, text2, mask, pooled, ts)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_patchify_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 3, 8, 12, 5))
    tokens = patchify(x, 2)
    assert tokens.shape == (2, 3 * 4 * 6, 20)
    back = unpatchify(tokens, 3, 8, 12, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_clip_positions_interpolated():
    # low-res 2-wide grid on a 4-wide train grid: positions interpolate 0..3
    pos = clip_positions(1, 2, 2, 4, 4, start_time=5)
    assert pos.shape == (4, 3)
    np.testing.assert_allclose(pos[:, 0], 5.0)
    # torch linear align_corners=False: src = (i+0.5)*2 - 0.5 -> 0.5, 2.5
    np.testing.assert_allclose(pos[:2, 1], [0.5, 0.5])
    np.testing.assert_allclose(pos[[0, 1], 2], [0.5, 2.5])


def test_pack_clips():
    b, c = 2, 4
    hist = jnp.ones((b, 2, 4, 4, c))   # 2 frames at half res
    cur = jnp.ones((b, 1, 8, 8, c))    # 1 frame full res
    tokens, pos, times, trainable = pack_clips([hist, cur])
    # hist: 2 * 2*2 = 8 tokens; cur: 4*4 = 16 tokens
    assert tokens.shape == (b, 24, 16)
    assert trainable == 16
    np.testing.assert_array_equal(times[:8], [0] * 4 + [1] * 4)
    np.testing.assert_array_equal(times[8:], [2] * 16)
    # history h/w positions live on the current clip's 4x4 grid
    assert pos[:8, 1].max() <= 3.0 and pos[:8, 1].min() >= 0.0


@pytest.mark.slow  # builds + runs a second model variant (~30 s); the
# default (guidance-free) forward stays fast via test_forward_shape
def test_guidance_embeds_variant():
    """Guidance-distilled temb (reference
    CombinedTimestepGuidanceTextProjEmbeddings, modeling_embedding.py:161):
    guidance changes the output; omitting it raises."""
    import pytest as _pytest

    import dataclasses as _dc
    cfg = _dc.replace(TINY, guidance_embeds=True)
    model = PyramidFluxTransformer(config=cfg, dtype=jnp.float32)
    b, l, lt = 1, 16, 8
    args = (jnp.ones((b, l, cfg.in_channels)) * 0.1, jnp.zeros((b, l, 3)),
            jnp.zeros((b, l), jnp.int32), jnp.ones((b, lt, cfg.joint_attention_dim)) * 0.1,
            jnp.ones((b, lt), bool), jnp.ones((b, cfg.pooled_projection_dim)) * 0.1,
            jnp.full((b,), 500.0))
    params = model.init(jax.random.PRNGKey(0), *args, guidance=jnp.full((b,), 7.0))
    assert "guidance_embedder_1" in params["params"]["time_text_embed"]
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = jax.tree.unflatten(
        treedef, [0.03 * jax.random.normal(k, p.shape, p.dtype)
                  for k, p in zip(keys, leaves)])
    o1 = model.apply(params, *args, guidance=jnp.full((b,), 3.0))
    o2 = model.apply(params, *args, guidance=jnp.full((b,), 9.0))
    assert float(jnp.abs(o1 - o2).max()) > 1e-6
    with _pytest.raises(AssertionError):
        model.apply(params, *args)
