"""MMDiT backbone tests: shapes, zero-init, causality, sincos table math,
and end-to-end generation through the pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyramid_flow_tpu.models.mmdit.model import (
    MMDiTConfig,
    PyramidDiffusionMMDiT,
    sincos_pos_embed_table,
)
from pyramid_flow_tpu.pipeline.pyramid_pipeline import PyramidFlowPipeline

TINY = MMDiTConfig(
    sample_size=32,
    in_channels=4,
    num_layers=2,
    attention_head_dim=8,
    num_attention_heads=4,
    caption_projection_dim=32,
    pooled_projection_dim=24,
    joint_attention_dim=32,
    pos_embed_max_size=24,
)


def make_inputs(key, b=2, l=24, lt=8, cfg=TINY):
    ks = jax.random.split(key, 4)
    tokens = jax.random.normal(ks[0], (b, l, cfg.token_dim))
    pos = np.zeros((l, 3), np.float32)
    pos[:, 0] = np.repeat(np.arange(l // 8), 8)
    pos[:, 1] = np.tile(np.arange(8) // 4, l // 8)
    pos[:, 2] = np.tile(np.arange(8) % 4, l // 8)
    pos = jnp.asarray(np.broadcast_to(pos[None], (b, l, 3)))
    time = pos[..., 0].astype(jnp.int32)
    text = jax.random.normal(ks[1], (b, lt, cfg.joint_attention_dim))
    mask = jnp.ones((b, lt), bool)
    pooled = jax.random.normal(ks[2], (b, cfg.pooled_projection_dim))
    ts = jnp.full((b,), 500.0)
    offset = jnp.full((b, 2), 4.0)
    return tokens, pos, time, text, mask, pooled, ts, offset


@pytest.fixture(scope="module")
def model_and_params():
    model = PyramidDiffusionMMDiT(config=TINY)
    inputs = make_inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), *inputs)
    return model, params


def test_forward_shape_and_zero_init(model_and_params):
    model, params = model_and_params
    out = model.apply(params, *make_inputs(jax.random.PRNGKey(2)))
    assert out.shape == (2, 24, TINY.token_dim)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def _randomize(params, key):
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(
        treedef,
        [0.05 * jax.random.normal(k, p.shape, p.dtype) for k, p in zip(keys, leaves)],
    )


@pytest.mark.slow
def test_temporal_causality(model_and_params):
    model, params = model_and_params
    params = _randomize(params, jax.random.PRNGKey(3))
    tokens, pos, time, text, mask, pooled, ts, off = make_inputs(
        jax.random.PRNGKey(4))
    out1 = model.apply(params, tokens, pos, time, text, mask, pooled, ts, off)
    tokens2 = tokens.at[:, -8:].add(1.0)
    out2 = model.apply(params, tokens2, pos, time, text, mask, pooled, ts, off)
    np.testing.assert_allclose(
        np.asarray(out1[:, :-8]), np.asarray(out2[:, :-8]), atol=1e-5)
    assert not np.allclose(out1[:, -8:], out2[:, -8:], atol=1e-5)


def test_sincos_table_matches_reference_formula():
    """Spot-check the diffusers formula: value at integer grid point."""
    d, g, base = 16, 8, 4
    table = sincos_pos_embed_table(d, g, base)
    assert table.shape == (g, g, d)
    # token at (h=2, w=3): scaled positions = idx / (g/base) = idx/2
    h_idx, w_idx = 2, 3
    half = d // 2
    omega = 1.0 / 10000 ** (np.arange(half // 2) / (half / 2))
    w_pos, h_pos = w_idx / 2.0, h_idx / 2.0
    expect_w = np.concatenate([np.sin(w_pos * omega), np.cos(w_pos * omega)])
    expect_h = np.concatenate([np.sin(h_pos * omega), np.cos(h_pos * omega)])
    np.testing.assert_allclose(table[h_idx, w_idx, :half], expect_w, atol=1e-6)
    np.testing.assert_allclose(table[h_idx, w_idx, half:], expect_h, atol=1e-6)


@pytest.mark.slow
def test_mmdit_pipeline_generation():
    model = PyramidDiffusionMMDiT(config=TINY, dtype=jnp.float32)
    inputs = make_inputs(jax.random.PRNGKey(5), b=1)
    params = model.init(jax.random.PRNGKey(6), *inputs)
    params = _randomize(params, jax.random.PRNGKey(7))
    pipe = PyramidFlowPipeline(
        model, params, model_name="pyramid_mmdit",
        latent_channels=4, dtype=jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(8), (1, 8, 32))
    mask = jnp.ones((1, 8), bool)
    pooled = jax.random.normal(jax.random.PRNGKey(9), (1, 24))
    out = pipe.generate(
        jax.random.PRNGKey(10), emb, mask, pooled, emb * 0, mask, pooled * 0,
        height=64, width=64, temp=2,
        num_inference_steps=[2, 2, 2], video_num_inference_steps=[1, 1, 1],
        output_type="latent",
    )
    assert out.shape == (1, 2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
